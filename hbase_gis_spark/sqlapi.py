"""SQL-facing surface: run the engine's spatial primitives from
``spark.sql(...)``.

Two tiers, mirroring the DataFrame planner's fast/slow split:

1. **Expression generators** (fast path): functions returning Spark-SQL
   text to splice into a query — plain comparisons/arithmetic that stay
   inside whole-stage codegen exactly like the Column forms.
   Generated-text SQL is the idiomatic Spark substitute for a custom
   Catalyst expression here: nothing to install, and Catalyst pushes
   the bbox / prefix conjuncts into the Parquet scan just as with the
   Column API (same predicates, same pushdown rules).

2. **Registered functions** (general path): :func:`register_sql_api`
   registers Arrow-batched pandas UDFs callable from SQL —
   ``hgs_geohash(lat, lon)`` and ``hgs_covers(wkt, lon, lat)`` (any
   polygon, including concave) — for the cases plain comparisons can't
   express. Prefer tier 1 when the polygon is convex; when you do use
   ``hgs_covers``, conjoin :func:`bbox_sql` so the UDF only sees rows
   surviving the pushable pre-filter (the same discipline
   ``operators.within`` applies).

Reference parity: this is the SQL analog of the reference's query
surface (WithinFilter / KNN / TopX clients, SURVEY.md §2) — the same
predicates, exposed to ``spark.sql`` instead of the DataFrame API.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbase_gis_spark.functions.geo import EARTH_RADIUS_M
from hbase_gis_spark.geo.geometry import parse_wkt
from hbase_gis_spark.geo.planner import minimum_bounding_prefixes
from hbase_gis_spark.oracles import distance_sql, halfplane_predicate_sql


def bbox_sql(wkt: str, lon_expr: str = "lon", lat_expr: str = "lat") -> str:
    """Pushable bounding-box pre-filter as SQL text (range comparisons
    reach the Parquet scan's PushedFilters)."""
    min_lon, min_lat, max_lon, max_lat = parse_wkt(wkt).bounds()
    return (
        f"({lon_expr} >= {min_lon!r} AND {lon_expr} <= {max_lon!r} AND "
        f"{lat_expr} >= {min_lat!r} AND {lat_expr} <= {max_lat!r})"
    )


def within_convex_sql(
    wkt: str, lon_expr: str = "lon", lat_expr: str = "lat"
) -> str:
    """Boundary-inclusive covers() for a CONVEX polygon as pure SQL:
    bbox conjunct (pushable) + CCW half-plane cross products + explicit
    NaN guard (Spark orders NaN greater than every number, so NaN
    would pass every ``>= 0`` term without it). Identical comparisons,
    same operand order, as ``operators.within.halfplane_predicate`` —
    the SQL and DataFrame forms return the same rows.

    Raises ValueError for concave rings — use ``hgs_covers`` (see
    :func:`register_sql_api`) for those."""
    half = halfplane_predicate_sql(wkt, lon_expr, lat_expr)
    return (
        f"({bbox_sql(wkt, lon_expr, lat_expr)} AND "
        f"NOT isnan({lon_expr}) AND NOT isnan({lat_expr}) AND {half})"
    )


def geohash_prefix_sql(
    wkt: str, geohash_expr: str = "geohash", max_precision: int = 7
) -> str:
    """Geohash-prefix pruning predicate as SQL text: an equality
    IN-list on ``substring(geohash, 1, p)`` — pushes into Parquet scans
    and prunes partitions of tables partitioned by the prefix."""
    prefixes = minimum_bounding_prefixes(parse_wkt(wkt), max_precision)
    p = len(prefixes[0])
    in_list = ", ".join(f"'{x}'" for x in prefixes)
    return f"substring({geohash_expr}, 1, {p}) IN ({in_list})"


def planar_distance_sql(
    origin_lon: float,
    origin_lat: float,
    lon_expr: str = "lon",
    lat_expr: str = "lat",
) -> str:
    """Planar degree distance (the reference's KNN metric) as SQL text,
    same op order as ``functions.geo.planar_distance``. KNN from SQL is
    then ``ORDER BY <this> ASC, id ASC LIMIT k`` — Spark plans it as
    TakeOrderedAndProject (bounded per-partition heaps + merge), the
    same physical plan as the DataFrame operator."""
    return distance_sql(origin_lon, origin_lat, lon_expr, lat_expr)


def haversine_distance_sql(
    origin_lon: float,
    origin_lat: float,
    lon_expr: str = "lon",
    lat_expr: str = "lat",
) -> str:
    """Great-circle distance in meters, same op order as
    ``functions.geo.haversine_distance``."""
    olat, olon = float(origin_lat), float(origin_lon)
    dphi = f"radians({lat_expr} - {olat!r})"
    dlmb = f"radians({lon_expr} - {olon!r})"
    a = (
        f"(sin({dphi} / 2) * sin({dphi} / 2) + "
        f"cos(radians({olat!r})) * cos(radians({lat_expr})) * "
        f"sin({dlmb} / 2) * sin({dlmb} / 2))"
    )
    return f"({2.0 * EARTH_RADIUS_M!r} * asin(sqrt({a})))"


def register_sql_api(spark: SparkSession) -> None:
    """Register the engine's SQL functions on a session (idempotent):

    - ``hgs_geohash(lat, lon) -> string``: geohash-12 of a coordinate
      (Arrow-batched numpy bisection kernel). Geohash cells nest, so a
      coarser cell is ``substring(hgs_geohash(lat, lon), 1, p)``.
    - ``hgs_covers(wkt, lon, lat) -> boolean``: boundary-inclusive
      point-in-polygon for ANY polygon (ray-cast kernel; the WKT is
      parsed once per distinct value per batch). Conjoin
      :func:`bbox_sql` in the same WHERE clause so the scan still
      prunes before rows reach Python.
    """

    @F.pandas_udf(T.StringType())
    def _hgs_geohash(lat_s: pd.Series, lon_s: pd.Series) -> pd.Series:
        from hbase_gis_spark.geo.geohash import encode_many

        return pd.Series(
            encode_many(
                lat_s.to_numpy(dtype="float64", na_value=float("nan")),
                lon_s.to_numpy(dtype="float64", na_value=float("nan")),
                12,
            )
        )

    @F.pandas_udf(T.BooleanType())
    def _hgs_covers(
        wkt_s: pd.Series, lon_s: pd.Series, lat_s: pd.Series
    ) -> pd.Series:
        lons = lon_s.to_numpy(dtype="float64", na_value=float("nan"))
        lats = lat_s.to_numpy(dtype="float64", na_value=float("nan"))
        out = np.zeros(len(wkt_s), dtype=bool)
        # WKT is almost always a literal → one parse per batch
        for wkt in wkt_s.dropna().unique():
            poly = parse_wkt(wkt)
            m = (wkt_s == wkt).to_numpy()
            out[m] = poly.covers(lons[m], lats[m])
        return pd.Series(out)

    spark.udf.register("hgs_geohash", _hgs_geohash)
    spark.udf.register("hgs_covers", _hgs_covers)
