"""Golden-count parity against the reference's OWN datasets.

These are the exact assertions of the reference test suite
(SURVEY.md §5 / BASELINE.md), replayed through our engine:

- Midtown 5-vertex polygon over wifi_4326.txt  -> 26 matches
  (TestWithinFilter.java:68-83; README.md:62)
- Reduced triangle                             -> 10 matches
  (TestWithinFilter.java:85-99)
- Unfiltered scan                              -> 1249 - duplicates rows
- Bulk ingest bbox invariant                   -> 1000 rows, all inside
  (TestBulkIngest.java:43-79)
- KNN k=10 distance-set equality vs brute force (TestKNN.java:56-107)
- TopX X=2 -> 207 candidates; group 68 -> 141  (TestTopX.java:133-153)

The input files are read from the reference checkout (read-only); tests
skip if the checkout is absent.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

import hbase_gis_spark as hgs
from hbase_gis_spark.operators.topx import top_x
from hbase_gis_spark.sources.ingest import (
    bulk_points,
    ingest_points_tsv,
    ingest_taxi_csv,
)

WIFI = "/root/reference/src/test/resources/wifi_4326.txt"
TAXI = "/root/reference/src/test/resources/yellow_tripdata_2021-07.csv"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(WIFI) and os.path.exists(TAXI)),
    reason="reference datasets not available",
)

MIDTOWN = (
    "POLYGON ((-73.980844 40.758703, -73.987214 40.761369, "
    "-73.990839 40.756400, -73.984422 40.753642, -73.980844 40.758703))"
)
# Midtown minus the third vertex (TestWithinFilter.java:89-92)
TRIANGLE = (
    "POLYGON ((-73.980844 40.758703, -73.987214 40.761369, "
    "-73.984422 40.753642, -73.980844 40.758703))"
)


@pytest.fixture(scope="module")
def wifi(spark):
    return ingest_points_tsv(spark, WIFI).cache()


@pytest.fixture(scope="module")
def taxi(spark):
    return ingest_taxi_csv(spark, TAXI).cache()


def test_wifi_row_count(wifi):
    # 1249 data rows minus geohash-12 duplicates (AbstractTestUtil.java:89-91)
    n = wifi.count()
    assert 1200 <= n <= 1249


def test_midtown_polygon_26(wifi):
    assert hgs.within(wifi, MIDTOWN).count() == 26


def test_midtown_polygon_pruned_26(wifi):
    assert hgs.within(wifi, MIDTOWN, geohash_col="geohash").count() == 26


def test_reduced_triangle_10(wifi):
    assert hgs.within(wifi, TRIANGLE).count() == 10


def test_bulk_ingest_bbox_invariant(spark):
    bbox = (-75.99, -75.01, 44.01, 44.99)
    df = bulk_points(spark, 1000, bbox[0], bbox[1], bbox[2], bbox[3]).cache()
    assert df.count() == 1000
    wkt = (
        f"POLYGON (({bbox[0]} {bbox[2]}, {bbox[0]} {bbox[3]}, "
        f"{bbox[1]} {bbox[3]}, {bbox[1]} {bbox[2]}, {bbox[0]} {bbox[2]}))"
    )
    assert hgs.within(df, wkt).count() == 1000


def test_knn_10_distance_set_equality(wifi):
    """TestKNN.java:87-106: the endpoint's 10 smallest distances equal
    the brute-force 10 smallest (set comparison on distances).
    Origin uses the code's swapped frame values verbatim
    (SURVEY.md §2 gotcha 6): lon=-73.97000655, lat=40.76098703."""
    ox, oy = -73.97000655, 40.76098703
    got = hgs.knn(wifi, ox, oy, 10, tiebreak_col="id").collect()
    assert len(got) == 10
    rows = wifi.select("lon", "lat").dropna().collect()
    brute = sorted(
        math.sqrt((r.lon - ox) ** 2 + (r.lat - oy) ** 2) for r in rows
    )[:10]
    assert sorted(round(r.distance, 12) for r in got) == [
        round(d, 12) for d in brute
    ]


def test_knn_per_prefix_candidate_counts(wifi):
    """KNNQuery.java:72-73 prints per-prefix candidate counts: one
    PrefixFilter scan per geohash-7 cell (the target of the swapped
    TestKNN origin + its 8 neighbors, KNNQuery.java:84-88) over the
    geohash-12-rowkey table. Pin all nine counts — the last
    reference-observable KNN behavior that was never asserted
    (VERDICT r4 next-round #7). The union is 8 < k=10: the
    reference's unmerged 9-cell candidate set CANNOT fill k=10 at
    this origin, which is exactly why our knn() merges a global
    fan-out instead (operators/knn.py K5 note)."""
    from hbase_gis_spark.geo.geohash import encode, neighbors

    ox, oy = -73.97000655, 40.76098703
    target = encode(oy, ox, 7)
    assert target == "dr5ruu2"
    cells = [target] + neighbors(target)
    counts = {
        p: wifi.filter(F.col("geohash").startswith(p)).count()
        for p in cells
    }
    assert counts == {
        "dr5ruu2": 2,
        "dr5ruu8": 0,
        "dr5ruu9": 1,
        "dr5ruu3": 2,
        "dr5ruu1": 1,
        "dr5ruu0": 1,
        "dr5rusp": 0,
        "dr5rusr": 1,
        "dr5rusx": 0,
    }
    assert sum(counts.values()) == 8  # < k=10: prefix scans starve


def test_topx_207_and_group_68(taxi):
    n = taxi.count()
    # X=2 over pu_id -> 207 candidates (TestTopX.java:138)
    assert top_x(taxi, "pu_id", "pu_ts", 2, tiebreak_col="rowkey").count() == 207
    # X=row_count -> every row survives (TestTopX.java:143)
    assert top_x(taxi, "pu_id", "pu_ts", n, tiebreak_col="rowkey").count() == n
    # group pu_id=68 holds 141 rows (TestTopX.java:152)
    all_rows = top_x(taxi, "pu_id", "pu_ts", n, tiebreak_col="rowkey")
    assert all_rows.filter(F.col("pu_id") == "68").count() == 141
