"""Geo kernel unit tests: geohash encode/decode/neighbors.

Anchor values come from the published geohash algorithm (e.g. the
canonical 'ezs42' example) — not from running the reference.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hbase_gis_spark.geo import geohash as gh

LATS = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
LONS = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)


def test_known_values():
    # canonical example from Niemeyer's geohash description
    assert gh.encode(42.6, -5.6, 5) == "ezs42"
    # well-known landmark hashes (public geohash explorer values)
    assert gh.encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert gh.encode(40.758, -73.9855, 7).startswith("dr5ru")


def test_encode_many_matches_scalar():
    rng = np.random.default_rng(7)
    lats = rng.uniform(-90, 90, 500)
    lons = rng.uniform(-180, 180, 500)
    batch = gh.encode_many(lats, lons, 12)
    for la, lo, b in zip(lats, lons, batch):
        assert b == gh.encode(la, lo, 12)


def test_encode_many_nan():
    out = gh.encode_many(np.array([40.0, np.nan]), np.array([np.nan, -73.0]), 6)
    assert out[0] is None and out[1] is None


@given(LATS, LONS, st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_decode_bbox_contains_point(lat, lon, p):
    h = gh.encode(lat, lon, p)
    lat_lo, lat_hi, lon_lo, lon_hi = gh.decode_bbox(h)
    assert lat_lo <= lat < lat_hi or lat == lat_hi == 90.0
    assert lon_lo <= lon < lon_hi or lon == lon_hi == 180.0


@given(LATS, LONS, st.integers(min_value=1, max_value=8))
@settings(max_examples=200, deadline=None)
def test_roundtrip_center(lat, lon, p):
    h = gh.encode(lat, lon, p)
    clat, clon = gh.decode(h)
    assert gh.encode(clat, clon, p) == h


@given(LATS, LONS, st.integers(min_value=2, max_value=8))
@settings(max_examples=200, deadline=None)
def test_neighbors_are_adjacent_and_distinct(lat, lon, p):
    h = gh.encode(lat, lon, p)
    nbs = gh.neighbors(h)
    assert h not in nbs
    assert len(nbs) == len(set(nbs))
    lat_h, lon_w = gh.cell_size(h)
    clat, clon = gh.decode(h)
    for nb in nbs:
        nlat, nlon = gh.decode(nb)
        dlon = abs(nlon - clon)
        dlon = min(dlon, 360.0 - dlon)  # antimeridian wrap
        assert dlon <= lon_w * 1.5 + 1e-9
        assert abs(nlat - clat) <= lat_h * 1.5 + 1e-9


def test_neighbors_count_interior():
    # interior cell: all 8 neighbors exist
    assert len(gh.neighbors("dr5ru")) == 8


def test_geohash6_cell_equivalence_with_bit_bins():
    """geohash-6 equality == equality of 15-bit lon/lat bin indices.

    This is the identity the dedup_geocell oracle SQL relies on
    (__spark_entry__.py): a 6-char geohash is 30 interleaved bits,
    15 for lon and 15 for lat, so two points share a geohash-6 cell
    iff floor((lon+180)/360 * 2^15) and floor((lat+90)/180 * 2^15)
    both match.
    """
    rng = np.random.default_rng(42)
    lons = rng.uniform(-74.05, -73.85, 2000)
    lats = rng.uniform(40.60, 40.90, 2000)
    hashes = gh.encode_many(lats, lons, 6)
    lon_bins = np.floor((lons + 180.0) / 360.0 * 32768.0).astype(np.int64)
    lat_bins = np.floor((lats + 90.0) / 180.0 * 32768.0).astype(np.int64)
    seen = {}
    for h, lb, tb in zip(hashes, lon_bins, lat_bins):
        key = (lb, tb)
        if key in seen:
            assert seen[key] == h
        else:
            seen[key] = h
    # and distinct bins -> distinct hashes
    assert len(set(seen.values())) == len(seen)


def test_native_column_encoder_matches_kernel(spark):
    """The pure-Column Morton/base32 encoder equals the bisection kernel
    (pandas-UDF path) on testdata-shaped, global-random, and edge
    coordinates — including NaN/null/out-of-range handling."""
    from pyspark.sql import functions as F

    from hbase_gis_spark.functions.geo import geohash_col_native, geohash_col_py

    pts = spark.sql(
        """
        SELECT (rand(7) * 180 - 90) AS lat, (rand(8) * 360 - 180) AS lon
        FROM range(200000)
        UNION ALL SELECT * FROM VALUES
          (cast('nan' as double), 1.0d), (NULL, 1.0d), (1.0d, NULL),
          (95.0d, 1.0d), (-95.0d, 200.0d), (90.0d, 180.0d),
          (-90.0d, -180.0d), (0.0d, 0.0d), (40.76d, -73.97d) AS t(lat, lon)
        """
    )
    for p in (12, 6, 1):
        cmp = pts.select(
            geohash_col_py(F.col("lat"), F.col("lon"), p).alias("a"),
            geohash_col_native(F.col("lat"), F.col("lon"), p).alias("b"),
        )
        bad = cmp.filter(~F.col("a").eqNullSafe(F.col("b"))).count()
        assert bad == 0, f"precision {p}: {bad} mismatches"
