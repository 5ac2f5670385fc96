"""Ordered funnel analysis: how many users complete step₁ → step₂ →
… → stepₖ in timestamp order.

Step i counts only if it happens strictly AFTER the user's earliest
completion of step i−1 (the standard product-analytics funnel
semantic: earliest-possible traversal, one pass per user, no
backtracking).

Physical shape: one conditional min-aggregate per step (map-side
partial combine; the per-step frames shrink monotonically) chained by
inner joins on the user key. With AQE the later, smaller step frames
broadcast automatically. k is small (funnel lengths of 3-6), so this
is k cheap aggregates — NOT a per-user event-sequence sort, which at
100 TB would shuffle every event into a per-user window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest completion time of each funnel step (null once
    the user falls out). Output: (user, t1..tk) — t_i is the earliest
    ``ts`` of step i strictly after t_{i-1}."""
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            df.filter(F.col(type_col) == step)
            .join(cur.select(user_col, f"t{i-1}"), user_col)
            .filter(F.col(ts_col) > F.col(f"t{i-1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """The funnel report: one row per step with how many users reached
    it (monotonically non-increasing by construction)."""
    times = funnel_times(df, steps, user_col, ts_col, type_col)
    counts = times.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = [
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"n{i}").alias("n_users"),
        )
        for i, step in enumerate(steps, start=1)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users"
    )


def funnel_conversion(counts: DataFrame) -> DataFrame:
    """Step-over-step conversion rates from a :func:`funnel_counts`
    frame (window lag over k rows — trivially small)."""
    from pyspark.sql import Window

    w = Window.orderBy("step_idx")
    prev = F.lag("n_users").over(w)
    rate = F.when(
        prev.isNotNull() & (prev > 0),
        F.col("n_users").cast("double") / prev.cast("double"),
    )
    return counts.withColumn("conversion", rate)


US_PER_DAY = 86_400_000_000


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Cohort retention triangle: users bucketed by their first active
    day (integer day = ts_us // µs-per-day — no timezone/calendar
    dependence, identical in any engine), counted per day-offset from
    that cohort day.

    Plan: distinct (user, day) first (collapses the event multiplicity
    early — the biggest frame never leaves the first aggregate), one
    min-aggregate for cohort assignment, a user-keyed join, and the
    final small (cohort × offset) count. Output:
    (cohort_day, day_offset, n_users)."""
    # integer division, NOT `/` + cast: float division can round up
    # across an integer boundary right at a day edge, and the oracle's
    # `//` would disagree
    days = df.select(
        F.col(user_col).alias("u"),
        F.expr(f"{ts_col} div {US_PER_DAY}").alias("day"),
    ).distinct()
    first = days.groupBy("u").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "u")
        .select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"), "u"
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("u").alias("n_users"))
    )


def conversion_lag(
    df: DataFrame,
    from_step: str,
    to_step: str,
    bucket_us: int = 3_600_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion-latency histogram: for every user who completes
    ``from_step`` and then (strictly after it) ``to_step``, the lag
    between the earliest such pair, bucketed — the "how long from
    first view to first purchase" distribution that sits next to the
    funnel's how-many counts.

    Same earliest-traversal semantics and physical shape as
    funnel_counts: one conditional min per step chained on the user
    key (the second frame only scans ``to_step`` rows and shrinks to
    converting users), then a |buckets|-row hash aggregate of the
    integer lag bucket (lag div bucket_us — truncating division,
    engine-exact). No per-user sequence sort anywhere.
    Output: (lag_bucket, n_users), lag_bucket in bucket_us units."""
    first_from = (
        df.filter(F.col(type_col) == from_step)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t0"))
    )
    first_to = (
        df.filter(F.col(type_col) == to_step)
        .join(first_from, user_col)
        .filter(F.col(ts_col) > F.col("__t0"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t1"), F.first("__t0").alias("__t0"))
    )
    return (
        first_to.select(
            F.expr(f"(__t1 - __t0) div {bucket_us}").alias("lag_bucket")
        )
        .groupBy("lag_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def window_funnel(
    df: DataFrame,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """ClickHouse-style ``windowFunnel``: per level j, how many users
    have SOME ordered chain step1 < step2 < ... < stepj whose total
    span fits in ``window_us`` — unlike :func:`funnel_counts`'
    earliest-traversal semantic, ANY anchor works, so a user who
    signed up twice gets credit if either signup opens a fast-enough
    chain (the retention question "did the user convert within N
    hours of a signup", not "of the FIRST signup").

    Exact single-shuffle formulation (no per-anchor join fan-out):
    only the chain's FIRST timestamp matters for the window, and a
    LATER first-step time can only help, so per event carry
    ``best_j = the maximum achievable chain-start time over chains of
    length j ending strictly before this row``:
    ``a_1 = ts if type = step1``; ``best_j = running max of a_j over
    strictly-preceding rows``; ``a_j = best_{j-1} if type = step_j``.
    A user reaches level j iff some step-j row has
    ``a_j >= ts - window_us``. Each ``best_j`` is a per-user ordered
    window with the same spec, so the whole ladder costs ONE user-key
    shuffle + one sort, k chained window passes — never an event
    self-join. "Strictly before" means earlier in (ts, id) order
    (row frame; simultaneous-timestamp events order by id — stated
    tie contract, identical in the oracle).

    Output: (level, step, n_users), level 1..k, monotone
    non-increasing."""
    from pyspark.sql import Window

    k = len(steps)
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cur = df.select(user_col, id_col, type_col, ts_col).withColumn(
        "a1",
        F.when(F.col(type_col) == steps[0], F.col(ts_col)),
    )
    for j in range(2, k + 1):
        cur = cur.withColumn(f"b{j-1}", F.max(f"a{j-1}").over(w))
        cur = cur.withColumn(
            f"a{j}",
            F.when(F.col(type_col) == steps[j - 1], F.col(f"b{j-1}")),
        )
    aggs = [
        F.countDistinct(
            F.when(F.col("a1").isNotNull(), F.col(user_col))
        ).alias("n1")
    ]
    for j in range(2, k + 1):
        aggs.append(
            F.countDistinct(
                F.when(
                    F.col(f"a{j}") >= F.col(ts_col) - F.lit(window_us),
                    F.col(user_col),
                )
            ).alias(f"n{j}")
        )
    row = cur.agg(*aggs)
    stack = ", ".join(
        f"{j}, '{steps[j-1]}', n{j}" for j in range(1, k + 1)
    )
    return row.selectExpr(
        f"stack({k}, {stack}) AS (level, step, n_users)"
    ).select(
        F.col("level").cast("bigint").alias("level"),
        "step",
        F.col("n_users").cast("bigint").alias("n_users"),
    )


def position_attribution(
    pairs: DataFrame,
    conv_col: str = "pid",
    touch_col: str = "vid",
    ts_col: str = "vus",
    first_ppm: int = 400_000,
    last_ppm: int = 400_000,
) -> DataFrame:
    """POSITION-BASED (U-shaped, 40/20/40) multi-touch attribution
    over (conversion, touch, touch_ts) pairs: the first and last
    touch of each conversion's journey take ``first_ppm``/``last_ppm``
    of the credit, the middles split the remainder — the standard
    middle ground between first-touch, last-touch, and
    ``linear_attribution``'s equal split.

    Exact integer credits, stated rounding: a lone touch takes the
    full 1,000,000 ppm; exactly two touches split the pot as
    ``first_ppm + mid div 2`` / ``last_ppm + mid − mid div 2`` (both
    plan-time Python constants — no runtime division); middles each
    take ``mid div (k − 2)`` ppm (non-negative, so truncate == floor
    in both engines) with the division remainder left unassigned —
    books under-add by at most k − 3 ppm per conversion, the same
    floor convention as linear_attribution (stated, never silently
    re-spread).

    Output: one row per (conversion, touch) —
    (``conv_col``, ``touch_col``, ``ts_col``, position 1..k,
    n_touches, credit_ppm). Deterministic order inside a journey:
    (ts, touch id).

    Scale shape: ONE shuffle on the conversion key; rank + count
    windows are PARTITIONED by conversion (journey-bounded, never
    global); credit assignment is pure integer arithmetic."""
    from pyspark.sql import Window

    mid_ppm = 1_000_000 - first_ppm - last_ppm
    w = Window.partitionBy(conv_col).orderBy(
        F.col("__ts").asc(), F.col(touch_col).asc()
    )
    staged = (
        pairs.select(
            F.col(conv_col),
            F.col(touch_col),
            F.col(ts_col).alias("__ts"),
        )
        .withColumn("__k", F.count(F.lit(1)).over(Window.partitionBy(conv_col)))
        .withColumn("__pos", F.row_number().over(w))
    )
    credit = (
        F.when(F.col("__k") == 1, F.lit(1_000_000))
        .when(
            F.col("__k") == 2,
            F.when(
                F.col("__pos") == 1, F.lit(first_ppm + mid_ppm // 2)
            ).otherwise(F.lit(last_ppm + mid_ppm - mid_ppm // 2)),
        )
        .when(F.col("__pos") == 1, F.lit(first_ppm))
        .when(F.col("__pos") == F.col("__k"), F.lit(last_ppm))
        .otherwise(F.expr(f"{mid_ppm} div (__k - 2)"))
    )
    return staged.select(
        conv_col,
        touch_col,
        F.col("__ts").alias(ts_col),
        F.col("__pos").cast("bigint").alias("position"),
        F.col("__k").cast("bigint").alias("n_touches"),
        credit.cast("bigint").alias("credit_ppm"),
    )


def time_decay_attribution(
    pairs: DataFrame,
    conv_col: str = "pid",
    touch_col: str = "vid",
    ts_col: str = "vus",
    conv_ts_col: str = "pus",
    half_life_us: int = 6 * 3600 * 1_000_000,
    max_steps: int = 4,
) -> DataFrame:
    """TIME-DECAY multi-touch attribution over (conversion, touch,
    touch_ts, conversion_ts) pairs: touches closer to the conversion
    take exponentially more credit — the recency-weighted member of
    the attribution family (linear_attribution = equal split,
    position_attribution = U-shaped).

    Engine-exact decay, stated contract: the decay is STEPWISE, not
    continuous — ``steps = (conv_ts − touch_ts) div half_life_us``
    (whole half-lives elapsed, truncating integer division), capped
    at ``max_steps``, and the touch weight is the integer
    ``2^(max_steps − steps)`` (a ``shiftleft``, never a libm
    ``pow``/``exp`` whose last-ulp rounding differs between JVM and
    system libm). Per-conversion credit is
    ``weight * 1_000_000 div Σweight`` ppm — non-negative truncating
    division, so floor == truncate in both engines and books
    under-add by at most (k−1) ppm per conversion (the same stated
    floor convention as linear/position attribution; the remainder is
    never silently re-spread). Touches at or past ``max_steps``
    half-lives all share the floor weight 1 — stated saturation, and
    with a 24 h lookback and 6 h half-life the cap is never binding.

    Output: one row per (conversion, touch) — (``conv_col``,
    ``touch_col``, ``ts_col``, steps, weight, credit_ppm).

    Scale shape: ONE shuffle on the conversion key; the Σweight
    window is PARTITIONED by conversion (journey-bounded, never
    global); weights and credits are pure integer arithmetic inside
    whole-stage codegen."""
    from pyspark.sql import Window

    # clamp at 0 BEFORE the cap. Division is NOT the hazard here (both
    # engines truncate toward zero — the b9190ae pinned measurement);
    # the SHIFT is: a malformed touch-after-conversion pair makes
    # steps negative, widening the shift past the weight contract, and
    # a wide-enough shift SILENTLY WRAPS in Spark (shiftleft is
    # 32-bit: 1<<40 == 256, measured) while DuckDB raises Out of
    # Range — the silent-vs-error engine divergence class. Clamped,
    # the shift stays in [0, max_steps] on every input.
    staged = pairs.select(
        F.col(conv_col),
        F.col(touch_col),
        F.col(ts_col).alias("__ts"),
        F.least(
            F.greatest(
                F.expr(f"({conv_ts_col} - {ts_col}) div {half_life_us}"),
                F.lit(0),
            ),
            F.lit(max_steps),
        )
        .cast("int")
        .alias("__steps"),
    )
    # shiftleft's numBits parameter is int-only in the Python API, so
    # build the shift as a SQL expression (still whole-stage codegen)
    staged = staged.withColumn(
        "__w", F.expr(f"shiftleft(1, {max_steps} - __steps)")
    )
    w = Window.partitionBy(conv_col)
    return staged.withColumn(
        "__tot", F.sum("__w").over(w)
    ).select(
        conv_col,
        touch_col,
        F.col("__ts").alias(ts_col),
        F.col("__steps").cast("bigint").alias("steps"),
        F.col("__w").cast("bigint").alias("weight"),
        F.expr("(__w * 1000000) div __tot").cast("bigint").alias("credit_ppm"),
    )
