"""Spatial join: annotate each point with every polygon that covers it.

The reference has no joins at all (SURVEY.md §2 "explicitly absent");
its within-query (WithinQuery.java:104-174) tests ONE polygon per scan.
This operator generalizes that to a polygon SET — the geofencing /
region-tagging shape a large pipeline needs — with two Spark-first
execution modes chosen by input shape:

- ``broadcast_mode`` (default, small polygon sets): ONE scan of the
  point table; every polygon's covers() test is a codegen'd
  conjunction of half-plane comparisons behind its own pushable bbox
  pre-filter, assembled into an array and exploded. Zero shuffle, zero
  Python for convex polygons; at 100 TB this is a map-only pass.
- cell-join mode (``geohash_col`` given, scales to large polygon
  sets): polygons expand driver-side into covering geohash prefixes
  (the reference's planner, WithinQuery.java:79-102, per polygon); the
  (cell, poly_id) table broadcast-hash-joins against the points' cell
  key — candidates are only the points inside covering cells — then the
  same codegen'd exact test filters candidates. The join is an
  equi-join on the truncated cell key, so Catalyst plans a
  BroadcastHashJoin: no point-table shuffle at any size.

Boundary semantics stay covers() (boundary-inclusive,
WithinFilter.java:99); NaN coordinates drop (WithinFilter.java:93-95).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_gis_spark.geo.geometry import parse_wkt
from hbase_gis_spark.geo.planner import minimum_bounding_prefixes
from hbase_gis_spark.operators.within import (
    bbox_predicate,
    covers_udf,
    halfplane_predicate,
)


def _exact_predicate(wkt: str, lon: Column, lat: Column) -> Column:
    """covers() with bbox pre-filter: convex → pure codegen; general →
    ray-cast pandas UDF guarded by the bbox (only bbox survivors reach
    Python)."""
    hp = halfplane_predicate(wkt, lon, lat)
    exact = hp if hp is not None else covers_udf(wkt, lon, lat)
    return bbox_predicate(wkt, lon, lat) & exact


def spatial_join(
    points: DataFrame,
    polygons: list[tuple[str, str]],
    lon_col: str = "lon",
    lat_col: str = "lat",
    geohash_col: str | None = None,
    max_precision: int = 7,
    poly_id_col: str = "poly_id",
) -> DataFrame:
    """Inner-join ``points`` to the polygons covering them.

    ``polygons``: [(poly_id, wkt), ...] — query-time parameters, like
    the reference's WKT argument (WithinQuery.java:184), so they live
    driver-side and ship to executors in the plan/closure.

    Returns the point rows with one output row per covering polygon
    (points covered by nothing are dropped; points in overlapping
    polygons appear once per polygon).
    """
    if not polygons:
        raise ValueError("polygons must be non-empty")
    lon = F.col(lon_col).cast("double")
    lat = F.col(lat_col).cast("double")
    # coarse pre-filter: the OR of all polygon bboxes — plain range
    # comparisons, so Catalyst pushes it into the Parquet scan
    # (row-group stats pruning) where the exploded/joined exact tests
    # below cannot reach. Semantics-preserving: every covered point is
    # inside its polygon's bbox.
    coarse = None
    for _, wkt in polygons:
        b = bbox_predicate(wkt, lon, lat)
        coarse = b if coarse is None else (coarse | b)
    points = points.filter(coarse)
    if geohash_col is None:
        # broadcast mode: array of per-polygon guarded ids, exploded.
        hits = F.array(
            *[
                F.when(_exact_predicate(wkt, lon, lat), F.lit(pid))
                for pid, wkt in polygons
            ]
        )
        return points.withColumn(
            poly_id_col,
            F.explode(F.filter(hits, lambda x: x.isNotNull())),
        )

    # cell-join mode: covering prefixes per polygon, truncated to the
    # shortest precision across polygons so the candidate join is a
    # single hash equi-join on a fixed-length cell key.
    per_poly = {
        pid: minimum_bounding_prefixes(parse_wkt(wkt), max_precision)
        for pid, wkt in polygons
    }
    join_len = min(len(p[0]) for p in per_poly.values())
    cells = sorted(
        {(pref[:join_len], pid) for pid, prefs in per_poly.items()
         for pref in prefs}
    )
    spark = points.sparkSession
    cell_df = spark.createDataFrame(cells, ["__cell", poly_id_col])
    cand = points.join(
        F.broadcast(cell_df),
        F.substring(F.col(geohash_col), 1, join_len) == F.col("__cell"),
    ).drop("__cell")
    # exact covers per candidate: CASE cascade on poly_id — convex
    # polygons stay a codegen'd comparison tree over the whole cascade
    exact = None
    for pid, wkt in polygons:
        branch = _exact_predicate(wkt, lon, lat)
        exact = (
            F.when(F.col(poly_id_col) == pid, branch)
            if exact is None
            else exact.when(F.col(poly_id_col) == pid, branch)
        )
    return cand.filter(exact.otherwise(F.lit(False)))
