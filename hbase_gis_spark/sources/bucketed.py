"""Bucketed-table sink for shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated fact-fact join (orders ⋈
lineitem every pipeline run) is re-shuffling both sides on the join
key every time. Spark bucketing pays that shuffle ONCE at write:
``bucketBy(n, key)`` hash-partitions rows into a fixed bucket count
persisted in the table metadata, and every later equi-join or
aggregation on the key reuses the bucketing as a reported output
partitioning — the join plans with NO Exchange on either bucketed
side (pinned in tests/test_bucketed.py). This is the Spark-native
equivalent of the reference's rowkey-ordered HBase regions: data
pre-organized by key so reads never re-sort (SURVEY.md §1.6).

Bucketing requires the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes cannot carry bucket metadata. Bucket count
is a real tuning choice at scale: buckets ≈ total_size /
target_partition_size, and BOTH sides of a co-located join must use
the same count (or a multiple, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort_by_key: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and by default
    sorted within buckets) on ``key``. Sorting makes later merge
    joins skip their per-partition sort too — the full
    exchange-free + sort-free join."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort_by_key:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table; the bucket spec rides the
    catalog metadata, so joins on the bucket key plan shuffle-free."""
    return spark.table(table)
