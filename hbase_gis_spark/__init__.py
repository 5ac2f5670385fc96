"""hbase_gis_spark — a PySpark-native spatial + training-data analytics engine.

Re-expresses the query capabilities of the reference system
(stackabletech/hbase-gis: geohash-rowkey HBase tables with within-polygon,
KNN, and grouped-top-X queries — see SURVEY.md) as idiomatic Spark
DataFrame transformations, and extends them with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): composable DataFrame transformers, no RDDs,
geometry as plain (lon double, lat double) columns, WKT only as query-time
parameters. Heavy lifting stays JVM-side via pyspark.sql.functions; the
only Python hot paths are vectorized (Arrow/pandas UDF) geohash encode and
point-in-polygon tests.
"""

from hbase_gis_spark.geo import geohash, geometry, planner  # noqa: F401
from hbase_gis_spark.operators.within import within  # noqa: F401
from hbase_gis_spark.operators.knn import knn, with_distance  # noqa: F401
from hbase_gis_spark.operators.topx import top_x, binned_limit  # noqa: F401

__version__ = "0.1.0"
