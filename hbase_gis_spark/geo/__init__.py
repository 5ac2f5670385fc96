"""Pure-Python geo kernel: geohash, planar geometry, prefix planner.

No Spark imports here — this package is unit-testable without a JVM and is
shipped to executors only inside pandas-UDF closures.
"""
