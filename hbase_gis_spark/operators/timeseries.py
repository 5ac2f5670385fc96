"""Time-series spine operators.

Dashboards and anomaly detectors break on SPARSE aggregates — a day
with zero events simply vanishes from a groupBy, so a 7-day rolling
mean silently shortens its window and a z-score never sees the outage
it should scream about. The fix is a dense spine: every (day, key)
combination present, zero-filled.

The reference has no time-series surface (extension scope, like the
OLAP family in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def dense_daily_counts(
    ev: DataFrame,
    ts_us_col: Column,
    key_col: str = "event_type",
) -> DataFrame:
    """Per-key daily event counts over a DENSE day spine: every day in
    [min_day, max_day] appears for every observed key, zero-filled
    where nothing happened. Output: (day, key_col, n_events).

    Scale shape: ONE hash aggregate over the fact table (map-side
    combined) collapses 100 TB of events to |days| x |keys| rows;
    everything after operates on that tiny aggregate — the day spine
    explodes from a broadcast 1-row min/max aggregate, the key dim is
    a distinct over the aggregate, and their product is a broadcast
    nested-loop of two dims (sanctioned: |days| x |keys|, never fact
    rows). Counts are integers end-to-end — engine-exact."""
    # integer division via expr (`/` on Columns rounds through double);
    # day values are epoch-positive so div == floor
    d = (
        ev.select(
            F.col(key_col).alias("key"),
            ts_us_col.alias("__us"),
        )
        .select("key", F.expr(f"__us div {US_PER_DAY}").alias("day"))
        .groupBy("day", "key")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    rng = d.agg(F.min("day").alias("__lo"), F.max("day").alias("__hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("day")
    )
    keys = d.select("key").distinct()
    return (
        spine.crossJoin(F.broadcast(keys))
        .join(d, ["day", "key"], "left")
        .select(
            "day",
            F.col("key").alias(key_col),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )
