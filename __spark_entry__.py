"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: hbase_gis_spark (see SURVEY.md §2 for the operator inventory
these entries cover). Oracle-parity rules used throughout:

- double arithmetic is written with the SAME operation order in the
  DataFrame code and the SQL so results are bit-identical;
- timestamps surface as epoch microseconds (testdata parquet is
  TIMESTAMP(NANOS): Spark reads long ns via nanosAsLong → ``div 1000``;
  DuckDB reads µs-truncated timestamps → ``epoch_us``);
- every tie is broken by a unique column in both engines;
- geohash-cell grouping is oracled via the bit-interleave identity
  (geohash-6 equality == 15-bit lon/lat bin equality, pinned by
  tests/test_geohash.py::test_geohash6_cell_equivalence_with_bit_bins).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hbase_gis_spark.operators.knn import knn
from hbase_gis_spark.operators.topx import binned_limit, top_x
from hbase_gis_spark.operators.within import within
from hbase_gis_spark.oracles import distance_sql, halfplane_predicate_sql
from hbase_gis_spark.sources.tables import (
    POINTS_SQL,
    derived_points,
    load_table,
)

SF0001 = "/root/testdata/sf0.001"

# Flagship query parameters: a convex pentagon over the derived point grid
# (shape mirrors the reference's Midtown polygon query, README.md:56-62).
WITHIN_WKT = (
    "POLYGON ((-74.00 40.70, -73.95 40.85, -73.90 40.75, "
    "-73.95 40.65, -74.00 40.70))"
)
KNN_LON, KNN_LAT, KNN_K = -73.95, 40.75, 10
TOPX_X = 3
BIN_MOD, BIN_PER, BIN_TOTAL = 16, 5, 64


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: within-polygon query over the derived point table at
    sf0.001, geohash-prefix pruned + exact covers test."""
    pts = derived_points(spark, SF0001, with_geohash=True)
    return within(pts, WITHIN_WKT, geohash_col="geohash").select(
        "id", "lon", "lat", "geohash"
    )


# ----------------------------------------------------------------- queries ---


def _q_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derived_points(spark, sf_dir)
    return within(pts, WITHIN_WKT).select("id", "lon", "lat")


def _q_within_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same result as _q_within; exercises the geohash prefix-pruning path
    pts = derived_points(spark, sf_dir, with_geohash=True)
    return within(pts, WITHIN_WKT, geohash_col="geohash").select("id", "lon", "lat")


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derived_points(spark, sf_dir)
    return knn(pts, KNN_LON, KNN_LAT, KNN_K, tiebreak_col="id").select(
        "id", "lon", "lat", "distance"
    )


def _q_topx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    return top_x(ev, "user_id", "ts_us", TOPX_X, tiebreak_col="event_id").select(
        "user_id", "event_id", "ts_us"
    )


def _q_binned_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return binned_limit(
        ev, F.col("event_id") % BIN_MOD, "event_id", BIN_PER, total_limit=BIN_TOTAL
    ).select("bin", "event_id")


def _q_dedup_geocell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 generalized: first-arrival dedup on the geohash-6 cell key
    (reference loader semantics, AbstractTestUtil.java:50-81)."""
    from hbase_gis_spark.functions.geo import geohash_col

    pts = derived_points(spark, sf_dir).withColumn(
        "gh6", geohash_col(F.col("lat"), F.col("lon"), 6)
    )
    w = Window.partitionBy("gh6").orderBy(F.col("id").asc())
    return (
        pts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "lon", "lat")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "within_polygon": _q_within,
        "within_polygon_pruned": _q_within_pruned,
        "knn_top10": _q_knn,
        "topx_per_group": _q_topx,
        "binned_limit": _q_binned_limit,
        "dedup_geocell": _q_dedup_geocell,
    }


# ------------------------------------------------------------------ oracles ---


def oracle_sql() -> dict[str, str]:
    within_sql = f"""
    WITH pts AS ({POINTS_SQL})
    SELECT id, lon, lat FROM pts
    WHERE {halfplane_predicate_sql(WITHIN_WKT)}
    """
    knn_sql = f"""
    WITH pts AS ({POINTS_SQL})
    SELECT id, lon, lat, {distance_sql(KNN_LON, KNN_LAT)} AS distance
    FROM pts
    ORDER BY distance ASC, id ASC
    LIMIT {KNN_K}
    """
    topx_sql = f"""
    SELECT user_id, event_id, ts_us FROM (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn <= {TOPX_X}
    """
    binned_sql = f"""
    SELECT bin, event_id FROM (
      SELECT event_id % {BIN_MOD} AS bin, event_id,
             row_number() OVER (PARTITION BY event_id % {BIN_MOD}
                                ORDER BY event_id ASC) AS rn
      FROM events
    ) WHERE rn <= {BIN_PER}
    ORDER BY bin ASC, event_id ASC
    LIMIT {BIN_TOTAL}
    """
    # geohash-6 cell == (15-bit lon bin, 15-bit lat bin); first id wins
    dedup_sql = f"""
    WITH pts AS ({POINTS_SQL})
    SELECT id, lon, lat FROM (
      SELECT id, lon, lat,
             row_number() OVER (
               PARTITION BY
                 CAST(floor((lon + 180.0) / 360.0 * 32768.0) AS BIGINT),
                 CAST(floor((lat + 90.0) / 180.0 * 32768.0) AS BIGINT)
               ORDER BY id ASC) AS rn
      FROM pts
    ) WHERE rn = 1
    """
    return {
        "within_polygon": within_sql,
        "within_polygon_pruned": within_sql,
        "knn_top10": knn_sql,
        "topx_per_group": topx_sql,
        "binned_limit": binned_sql,
        "dedup_geocell": dedup_sql,
    }
