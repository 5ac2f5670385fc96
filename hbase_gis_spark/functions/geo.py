"""Geo column functions: geohash encode UDF and planar distance expression.

The only Python-side hot path in the spatial operators is geohash encode
(pandas UDF, Arrow-batched, vectorized numpy bisection in
``geo.geohash.encode_many``). Point-in-polygon lives in
``operators.within``. Distance is a pure JVM column expression.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def geohash_col(lat: Column, lon: Column, precision: int = 12) -> Column:
    """Geohash (base-32) column of (lat, lon) at fixed ``precision``.

    Reference: rowkey construction at Ingest.java:77 / BulkIngest.java:90
    (``GeoHash.withCharacterPrecision(lat, lon, 12).toBase32()``).
    NaN/null coordinates produce null (reference drops NaN rows,
    WithinFilter.java:93-95).
    """

    @F.pandas_udf(T.StringType())
    def _geohash(lat_s: pd.Series, lon_s: pd.Series) -> pd.Series:
        # import inside the UDF so only the pure-python kernel ships to workers
        from hbase_gis_spark.geo.geohash import encode_many

        out = encode_many(
            lat_s.to_numpy(dtype="float64", na_value=float("nan")),
            lon_s.to_numpy(dtype="float64", na_value=float("nan")),
            precision,
        )
        return pd.Series(out)

    return _geohash(lat, lon)


def planar_distance(
    lon: Column, lat: Column, origin_lon: float, origin_lat: float
) -> Column:
    """Euclidean distance in degree space — the reference's metric
    (DistanceComparator.java:18-27 uses Point2D.distance, NOT haversine).

    Kept as a JVM column expression (whole-stage codegen'd); written as
    sqrt(dx*dx + dy*dy) so the DuckDB oracle can reproduce it bit-for-bit.
    """
    dx = lon - F.lit(float(origin_lon))
    dy = lat - F.lit(float(origin_lat))
    return F.sqrt(dx * dx + dy * dy)
