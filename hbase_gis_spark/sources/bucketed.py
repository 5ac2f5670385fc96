"""Bucketed (co-located) table layout — the shuffle-elimination story
for repeated big-big joins.

At 100 TB the dominant cost of a key-key join is the shuffle of both
sides. Spark's bucketing (`bucketBy(n, key)` + `sortBy`) persists each
side pre-partitioned (and pre-sorted) by the join key: a join between
two tables bucketed by the same key into the same bucket count plans
with NO Exchange on either side — each task zips bucket i with bucket
i. The pin test (tests/test_corpus.py) asserts the Exchange-free plan,
not just the row counts.

Bucketing requires the table catalog (`saveAsTable`) — path-only
parquet cannot carry bucket metadata. Pick the bucket count once per
dataset family (here: both sides must match; a multiple also works for
one-side coalesced bucketed reads when
`spark.sql.bucketing.coalesceBucketsInJoin.enabled` is set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) by ``key`` — subsequent equi-joins between tables bucketed
    on the same key/count plan shuffle-free, and the sort enables
    merge-join without a per-task sort."""
    w = df.write.mode(mode).bucketBy(buckets, key).format("parquet")
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left: str, right: str, key: str
) -> bool:
    """True iff joining catalog tables ``left`` and ``right`` on
    ``key`` plans without any Exchange (shuffle) operator — the
    co-location proof used by the bucketing pin test."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the test exercises the shuffle path the
        # bucketing is supposed to eliminate
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(left).join(spark.table(right), key)
        plan = j._jdf.queryExecution().executedPlan().toString()
        return "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table; the bucket spec rides the
    catalog metadata, so joins on the bucket key plan shuffle-free."""
    return spark.table(table)
