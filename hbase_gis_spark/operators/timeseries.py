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


def cusum_days(
    ev: DataFrame,
    ts_us_col: Column,
    key_col: str = "event_type",
    threshold_milli: int = 50,
) -> DataFrame:
    """Per-key CUSUM change-point screen over daily event counts:
    for each (key, day), the cumulative deviation of observed volume
    from the key's flat-rate expectation, and a flag where it exceeds
    ``threshold_milli``/1000 of the key's total volume. A sustained
    rate shift drives the cusum away from zero linearly, where a
    single noisy day only bumps it once — the classic reason CUSUM
    beats per-day z-scores (``daily_anomalies``) for detecting level
    changes rather than spikes.

    Engine-exact integer form: with N days, total S, and prefix_k the
    cumulative count through day k, the textbook statistic
    C_k = prefix_k - k*S/N is carried scaled by N::

        cusum_scaled = N * prefix_k - k * S          (BIGINT, exact)
        is_change    = 1000 * |cusum_scaled| > threshold_milli * N * S

    so no division ever happens and both engines agree bit-for-bit
    (C_N == 0 by construction — the statistic is mean-anchored).

    Scale shape: inherits :func:`dense_daily_counts`' ONE fact-table
    hash aggregate (zero-days must exist or the deviation is wrong);
    everything else — per-key totals, the prefix window, the flag — is
    arithmetic over the |days| x |keys| aggregate, thousands of rows
    at any corpus size."""
    from pyspark.sql import Window

    d = dense_daily_counts(ev, ts_us_col, key_col)
    totals = d.groupBy(key_col).agg(
        F.sum("n_events").alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    w = Window.partitionBy(key_col).orderBy(F.col("day").asc())
    return (
        d.join(F.broadcast(totals), key_col)
        .select(
            key_col,
            "day",
            "n_events",
            (
                F.col("__n") * F.sum("n_events").over(w)
                - F.row_number().over(w) * F.col("__s")
            ).alias("cusum_scaled"),
            F.col("__n").alias("__n"),
            F.col("__s").alias("__s"),
        )
        .select(
            key_col,
            "day",
            "n_events",
            "cusum_scaled",
            F.when(
                F.abs(F.col("cusum_scaled")) * 1000
                > F.lit(threshold_milli) * F.col("__n") * F.col("__s"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("is_change"),
        )
    )


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
