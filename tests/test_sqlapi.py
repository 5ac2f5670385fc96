"""SQL surface tests: spark.sql(...) forms agree with the DataFrame
operators row-for-row, and the SQL plans keep the fast-path shapes
(TakeOrderedAndProject for top-k, pushed filters for bbox)."""

import pytest
from pyspark.sql import functions as F

import hbase_gis_spark as hgs
from hbase_gis_spark.functions.geo import geohash_col, haversine_distance
from hbase_gis_spark.sources.tables import derived_points
from tests.conftest import SF0001

CONVEX_WKT = (
    "POLYGON ((-73.99 40.72, -73.97 40.76, -73.93 40.74, "
    "-73.95 40.70, -73.99 40.72))"
)
CONCAVE_WKT = (
    "POLYGON ((-74.00 40.62, -73.90 40.62, -73.90 40.86, "
    "-74.00 40.86, -73.95 40.74, -74.00 40.62))"
)


@pytest.fixture(scope="module")
def pts_view(spark):
    derived_points(spark, SF0001).createOrReplaceTempView("pts")
    return "pts"


def test_within_convex_sql_matches_dataframe(spark, pts_view):
    pred = hgs.within_convex_sql(CONVEX_WKT)
    got = {
        r.id
        for r in spark.sql(f"SELECT id FROM pts WHERE {pred}").collect()
    }
    want = {
        r.id
        for r in hgs.within(derived_points(spark, SF0001), CONVEX_WKT).collect()
    }
    assert got == want and len(want) > 0


def test_within_convex_sql_rejects_concave():
    with pytest.raises(ValueError):
        hgs.within_convex_sql(CONCAVE_WKT)


def test_hgs_covers_matches_dataframe_concave(spark, pts_view):
    hgs.register_sql_api(spark)
    bbox = hgs.bbox_sql(CONCAVE_WKT)
    got = {
        r.id
        for r in spark.sql(
            f"SELECT id FROM pts WHERE {bbox} "
            f"AND hgs_covers('{CONCAVE_WKT}', lon, lat)"
        ).collect()
    }
    want = {
        r.id
        for r in hgs.within(
            derived_points(spark, SF0001), CONCAVE_WKT
        ).collect()
    }
    assert got == want and len(want) > 0


def test_hgs_geohash_matches_native_encoder(spark, pts_view):
    hgs.register_sql_api(spark)
    via_sql = spark.sql(
        "SELECT id, hgs_geohash(lat, lon) AS gh FROM pts LIMIT 200"
    )
    native = derived_points(spark, SF0001).select(
        "id", geohash_col(F.col("lat"), F.col("lon"), 12).alias("gh")
    )
    a = {r.id: r.gh for r in via_sql.collect()}
    b = {r.id: r.gh for r in native.collect()}
    assert all(a[i] == b[i] for i in a)


def test_knn_sql_is_take_ordered(spark, pts_view):
    dist = hgs.planar_distance_sql(-73.95, 40.75)
    q = spark.sql(
        f"SELECT id, {dist} AS distance FROM pts "
        "ORDER BY distance ASC, id ASC LIMIT 10"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = [r.id for r in q.collect()]
    want = [
        r.id
        for r in hgs.knn(
            derived_points(spark, SF0001), -73.95, 40.75, 10, tiebreak_col="id"
        ).collect()
    ]
    assert got == want


def test_haversine_sql_matches_column_expr(spark, pts_view):
    expr = hgs.haversine_distance_sql(-73.95, 40.75)
    via_sql = {
        r.id: r.d
        for r in spark.sql(f"SELECT id, {expr} AS d FROM pts LIMIT 100").collect()
    }
    via_col = {
        r.id: r.d
        for r in derived_points(spark, SF0001)
        .select(
            "id",
            haversine_distance(F.col("lon"), F.col("lat"), -73.95, 40.75).alias("d"),
        )
        .collect()
    }
    assert all(via_sql[i] == via_col[i] for i in via_sql)


def test_geohash_prefix_sql_is_superset_filter(spark, pts_view):
    """The prefix IN-list must keep every point the polygon covers
    (superset semantics) while cutting the candidate set."""
    hgs.register_sql_api(spark)
    pred = hgs.geohash_prefix_sql(CONVEX_WKT, "hgs_geohash(lat, lon)")
    kept = {
        r.id for r in spark.sql(f"SELECT id FROM pts WHERE {pred}").collect()
    }
    covered = {
        r.id
        for r in hgs.within(derived_points(spark, SF0001), CONVEX_WKT).collect()
    }
    total = spark.table("pts").count()
    assert covered <= kept
    assert len(kept) < total
