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

from pyspark.sql import Column, DataFrame, Window
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


def autocorr_lag(
    days: DataFrame,
    lag: int,
    day_col: str = "day",
    value_col: str = "cents",
    scale_div: int = 1,
) -> DataFrame:
    """Lag-k Pearson autocorrelation of a pre-aggregated daily series
    — the seasonality detector (lag 7 screams on weekly patterns) and
    the residual-whiteness check behind every forecast. Output: one
    row (lag, n_pairs, r).

    No window at all: the lagged pairing is a SELF-JOIN on
    ``day = day + lag`` (day frames are dense spines, so the join
    hits every eligible pair), then ONE aggregate of the six exact
    BIGINT moment sums; r = (n*Sxy - Sx*Sy) /
    sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)) is the only float, computed
    once from the integer moments and rounded to 9 — engine-exact by
    the established moments discipline (spearman/chi2).

    Overflow: moment sums are DECIMAL(38,0) (Spark BigDecimal) vs
    HUGEINT (DuckDB int128) — both EXACT integers at any realistic
    scale (squares of per-day totals summed over a calendar of days
    stay far under 1e38), so the two engines hold identical integer
    moments and the one double conversion at the end rounds the same
    integers to the same doubles (IEEE nearest). ``scale_div``
    remains as a knob for series whose squares would approach the
    128-bit bound."""
    x = days.select(
        F.col(day_col).alias("__d"),
        F.expr(f"CAST({value_col} AS BIGINT) div {scale_div}").alias("__x"),
    )
    y = x.select(
        (F.col("__d") + lag).alias("__d"), F.col("__x").alias("__y")
    )
    xd = F.col("__x").cast("decimal(20,0)")
    yd = F.col("__y").cast("decimal(20,0)")
    m = (
        x.join(y, "__d")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(xd).alias("__sx"),
            F.sum(yd).alias("__sy"),
            F.sum(xd * xd).alias("__sxx"),
            F.sum(yd * yd).alias("__syy"),
            F.sum(xd * yd).alias("__sxy"),
        )
    )
    n_dec = F.col("n_pairs").cast("decimal(20,0)")
    num = n_dec * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    denx = n_dec * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    deny = n_dec * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return m.select(
        F.lit(lag).alias("lag"),
        "n_pairs",
        F.round(
            num.cast("double")
            / F.sqrt(denx.cast("double") * deny.cast("double")),
            9,
        ).alias("r"),
    )


def weekday_profile(
    ev: DataFrame,
    ts_us_col: Column,
    value_col: str = "value",
) -> DataFrame:
    """Day-of-week seasonality profile: per weekday (0 = Monday,
    epoch-day arithmetic — 1970-01-01 was a Thursday, so
    dow = (day + 3) % 7), event count, exact milli-unit value sum
    (each value rounds to integer millis BEFORE the sum — the
    summation-order discipline), and the ppm share of total events.

    Scale shape: one map-side-combined 7-key hash aggregate over the
    fact table + a broadcast 1-row total; output is always 7 rows."""
    # integer day via a staged projection (`div` keeps it exact; `/`
    # on Columns would round through double)
    # NaN guard BEFORE the bigint cast: non-ANSI Spark casts NaN to 0
    # silently while DuckDB errors (the mrl_report lesson); NULL/NaN
    # values contribute the count but not the milli sum
    v = F.col(value_col).cast("double")
    base = (
        ev.select(
            ts_us_col.alias("__us"),
            F.round(F.when(~F.isnan(v), v) * 1000, 0)
            .cast("bigint")
            .alias("__vm"),
        )
        .select(
            F.expr(f"(__us div {US_PER_DAY} + 3) % 7").alias("dow"), "__vm"
        )
    )
    g = base.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__vm").alias("sum_value_milli"),
    )
    total = g.agg(F.sum("n_events").alias("__t"))
    return g.crossJoin(F.broadcast(total)).select(
        "dow",
        "n_events",
        "sum_value_milli",
        F.expr("(n_events * 1000000) div __t").alias("share_ppm"),
    )


def _bounded_rank_select(df, value_col: str, num: int, den: int):
    """EXACT value at global rank ceil(num*N/den) of a DIM-BOUNDED
    frame (|days| / calendar scale): one partition-less rank window —
    allowlisted in tests/test_plan_hygiene.py under the
    calendar-bounded argument; NEVER feed a fact-scale frame here,
    that is rank.global_percentiles' job. NULL/NaN-free integer input
    by contract. Lazy 1-row output (no driver action)."""
    w = Window.orderBy(F.col("__v").asc())
    tot = Window.partitionBy()
    return (
        df.select(F.col(value_col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .select(
            "__v",
            F.row_number().over(w).alias("__r"),
            F.count(F.lit(1)).over(tot).alias("__n"),
        )
        .filter(
            F.col("__r")
            == F.expr(f"({num} * __n + {den - 1}) div {den}")
        )
        .select(F.col("__v").alias("__sel"))
    )


def mad_anomalies(
    days: DataFrame,
    day_col: str = "day",
    value_col: str = "cents",
    k_milli: int = 3500,
    n_shards: int = 64,
) -> DataFrame:
    """Robust daily anomaly screen: flag days whose deviation from
    the MEDIAN exceeds ``k_milli/1000`` times the median absolute
    deviation (MAD) — the outlier-resistant alternative to
    ``daily_anomalies``' mean/std z-scores, which a single extreme
    day can mask (it inflates the std it is judged against; the
    median barely moves).

    FULLY integer-exact — unusual for an anomaly detector: both the
    median and the MAD are rank SELECTIONS at ceil(N/2) via
    rank.global_percentiles (range shards + bounded driver prefix,
    never a single-task sort, no arithmetic on the selected values),
    and the flag compares 1000*|x - med| against k_milli*MAD in
    BIGINTs. Output: every day with (value, deviation, median, mad,
    is_anomaly).

    Scale shape: the input is already a |days|-sized aggregate
    (calendar-bounded by contract — the daily_rolling allowlist
    argument), so both selections run as ONE bounded rank window via
    :func:`_bounded_rank_select`, lazily, with no driver round-trips
    — round 6 replaced two eager sharded selections that paid 2
    boundary sketches + 2 size collects to rank a few hundred rows.
    ``n_shards`` is kept for API compatibility and ignored; rank a
    FACT-scale column with rank.global_percentiles instead."""
    vals = days.select(
        F.col(day_col).alias("day"),
        F.col(value_col).cast("bigint").alias("value"),
    )
    med = _bounded_rank_select(vals, "value", 1, 2).select(
        F.col("__sel").cast("bigint").alias("__med")
    )
    devs = vals.crossJoin(F.broadcast(med)).select(
        "day",
        "value",
        F.abs(F.col("value") - F.col("__med")).alias("deviation"),
        "__med",
    )
    mad = _bounded_rank_select(devs, "deviation", 1, 2).select(
        F.col("__sel").cast("bigint").alias("__mad")
    )
    return devs.crossJoin(F.broadcast(mad)).select(
        "day",
        "value",
        "deviation",
        F.col("__med").alias("median"),
        F.col("__mad").alias("mad"),
        (
            F.lit(1000) * F.col("deviation")
            > F.lit(k_milli) * F.col("__mad")
        )
        .cast("int")
        .alias("is_anomaly"),
    )


def cumulative_users(
    events: DataFrame,
    ts_us_expr,
    user_col: str = "user_id",
) -> DataFrame:
    """Cumulative distinct-user reach per day — the growth curve
    every launch dashboard plots. Counting distinct users per prefix
    naively is a running set-union (unbounded state); instead each
    user collapses to their FIRST-SEEN day (one exact aggregate) and
    the reach curve is the running sum of the per-day new-user
    counts, which telescopes to the same number. Output per active
    first-seen day: (day, new_users, cum_users).

    Scale shape: one (user)-keyed min aggregate (map-side combined)
    + one |days|-row aggregate + one cumulative window over the
    pre-aggregated day frame — the frame is calendar-bounded
    (|days| rows, never raw events), which is why the partition-less
    window is allowlisted for this module (the daily_rolling
    argument, tests/test_plan_hygiene.py)."""
    first = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(
            (ts_us_expr if not isinstance(ts_us_expr, str)
             else F.expr(ts_us_expr))
            .cast("bigint")
        ).alias("__first_us")
    )
    per_day = (
        first.select(
            F.expr("__first_us div 86400000000").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = (
        Window.orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


def naive_backtest(
    days: DataFrame,
    lags: list[int],
    day_col: str = "day",
    value_col: str = "cents",
) -> DataFrame:
    """Naive-forecast backtest over a pre-aggregated daily series:
    for each lag, score the forecaster "tomorrow equals lag days
    ago" — lag 1 is the persistence baseline every real model must
    beat, lag 7 the seasonal-naive twin of autocorr_lag's weekly
    detector. Output one row per lag: (lag, n_pairs,
    total_abs_err, mae = floor integer mean absolute error in the
    series' own units).

    Engine-exact: the pairing is the autocorr_lag self-join on
    ``day = day + lag`` (dense day spines hit every eligible pair),
    errors are BIGINT absolute differences, mae a floor division —
    no float anywhere.

    Scale shape: per lag one |days|-row self-join + a 1-row
    aggregate; the frame is calendar-bounded, never raw rows."""
    out = None
    for lag in lags:
        x = days.select(
            F.col(day_col).alias("__d"),
            F.col(value_col).cast("bigint").alias("__x"),
        )
        y = x.select(
            (F.col("__d") + lag).alias("__d"), F.col("__x").alias("__y")
        )
        row = (
            x.join(y, "__d")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.coalesce(
                    F.sum(F.abs(F.col("__x") - F.col("__y"))), F.lit(0)
                ).alias("total_abs_err"),
            )
            .select(
                F.lit(lag).alias("lag"),
                "n_pairs",
                "total_abs_err",
                F.expr(
                    "CASE WHEN n_pairs > 0"
                    " THEN total_abs_err div n_pairs END"
                ).alias("mae"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def weekday_adjusted_anomalies(
    days: DataFrame,
    z_milli: int = 2000,
    day_col: str = "day",
    value_col: str = "n_events",
) -> DataFrame:
    """Seasonality-corrected anomaly screen: each day's count is
    z-scored against the OTHER days sharing its weekday (leave-one-out
    moments), so a busy-Monday pattern stops masquerading as seven
    weekly anomalies — the weekday-aware complement of
    daily_anomalies' trailing window. Output flagged days only:
    (day, dow, y, z), z rounded to 9.

    Engine-exact: per-weekday n/Σy/Σy² are exact integer sums over the
    pre-aggregated day frame — Σy² accumulates in DECIMAL(38,0) with
    the cast BEFORE the multiply (round-7 overflow sweep: a per-day
    value y wraps int64 y² at y > ~3e9, i.e. a $30M revenue day in
    cents — Spark would wrap SILENTLY where DuckDB promotes to
    HUGEINT; the decimal holds to y ~ 1e19); the leave-one-out
    correction is exact integer subtraction in the same decimal; ONE
    double z per surviving row. Scale shape: a 7-row stats dim
    broadcast back onto the |days|-row frame — nothing beyond the day
    aggregate scales with the raw table."""
    d = days.select(
        F.col(day_col).alias("day"),
        F.expr(f"({day_col} + 3) % 7").alias("dow"),
        F.col(value_col).cast("bigint").alias("y"),
    )
    stats = d.groupBy("dow").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("y").alias("__s"),
        # cast BEFORE multiplying (the important_parts/gini lesson)
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("__s2"),
    )
    j = d.join(F.broadcast(stats), "dow").filter(F.col("__n") >= 3)
    nl = (F.col("__n") - 1).cast("double")
    sl = (F.col("__s") - F.col("y")).cast("double")
    s2l = (
        F.col("__s2") - F.col("y").cast("decimal(38,0)") * F.col("y")
    ).cast("double")
    mean = sl / nl
    var = s2l / nl - mean * mean
    # constant peers give no scale: a deviant against zero variance is
    # trivially anomalous (flagged with NULL z), never a division
    z = F.when(
        var > 0,
        F.round((F.col("y").cast("double") - mean) / F.sqrt(var), 9),
    )
    staged = j.select(
        "day", "dow", "y", z.alias("z"), var.alias("__var"), mean.alias("__mean")
    )
    return staged.filter(
        (F.col("z") >= z_milli / 1000.0)
        | (F.col("z") <= -z_milli / 1000.0)
        | (
            (F.col("__var") == 0.0)
            & (F.col("y").cast("double") != F.col("__mean"))
        )
    ).select("day", "dow", "y", "z")


def seasonal_decompose_daily(
    days: DataFrame,
    day_col: str = "day",
    value_col: str = "cents",
    period: int = 7,
) -> DataFrame:
    """Classical additive decomposition of a daily series —
    value = trend + seasonal + residual — the STL-lite screen that
    separates "weekends are always low" (seasonal) from "this week is
    genuinely sagging" (trend) from "Tuesday was weird" (residual),
    which raw anomaly flags conflate.

    Method, ALL-INTEGER and engine-exact: trend is the CENTERED
    ``period``-day moving average in milli units; the seasonal
    component is the day-of-week mean of the detrended series; the
    residual is an exact subtraction. Every division uses the
    TRUNCATING identity ``(a - a % b) / b`` — `%` follows the
    dividend's sign identically in Spark and DuckDB, so both engines
    truncate the (possibly negative) detrended means the same way
    REGARDLESS of each engine's native integer-division convention
    (measured round 7: current DuckDB ``//`` truncates like Spark
    ``div``, but Python's ``//`` floors — the identity keeps the
    contract engine- and version-proof); float round(.,9) is
    ulp-unstable at 1e10+ magnitudes.
    The numerator must stay under 2^53 (exact double quotient):
    per-day milli totals to ~9e15, far past any daily revenue. dow
    anchors Thursday = epoch day 0 via (day+3) % 7, the
    weekday_profile convention.

    Output: (day, value, trend_milli, seasonal_milli,
    residual_milli) — all exact BIGINTs; trend/residual NULL on the
    ``period//2`` edge days.

    ``period`` must be ODD (7 by default): the centered
    rangeBetween(-period//2, period//2) frame spans exactly ``period``
    days only then — an even period would make the frame span
    period+1 days, so the ``count == period`` trend guard would NULL
    every dense window and instead fire off-center on windows missing
    exactly one day (ADVICE r6 #3). The classical 2xMA used for even
    periods is deliberately out of scope; raise loudly rather than
    decompose wrong.

    Scale shape: the input is a per-DAY aggregate (calendar-bounded
    by contract), so the centered range window is a bounded
    partition-less window (allowlisted — the daily_rolling argument);
    the seasonal dim is ``period`` rows broadcast back. Never feed
    raw fact rows here — aggregate to days first."""
    if period % 2 == 0 or period < 1:
        raise ValueError(
            f"seasonal_decompose_daily: period must be a positive ODD "
            f"number of days (got {period}) — the centered "
            f"count==period trend guard is only correct for odd "
            f"periods; use the classical 2xMA elsewhere for even ones"
        )
    half = period // 2
    w = (
        Window.orderBy(F.col("day").asc())
        .rangeBetween(-half, half)
    )
    base = days.select(
        F.col(day_col).cast("bigint").alias("day"),
        F.col(value_col).cast("bigint").alias("value"),
    )
    msum = F.sum(F.col("value") * 1000).over(w)
    trended = base.select(
        "day",
        "value",
        F.when(
            F.count(F.lit(1)).over(w) == period,
            (msum - msum % period) / period,
        )
        .cast("bigint")
        .alias("trend_milli"),
    ).withColumn(
        "__det", F.col("value") * 1000 - F.col("trend_milli")
    ).withColumn("__dow", F.expr("(day + 3) % 7"))
    seasonal = (
        trended.groupBy("__dow")
        .agg(
            F.sum("__det").cast("bigint").alias("__s"),
            F.count("__det").alias("__c"),
        )
        .select(
            "__dow",
            F.when(
                F.col("__c") > 0,
                (
                    (F.col("__s") - F.col("__s") % F.col("__c"))
                    / F.col("__c")
                ).cast("bigint"),
            ).alias("seasonal_milli"),
        )
    )
    return (
        trended.join(F.broadcast(seasonal), "__dow")
        .select(
            "day",
            "value",
            "trend_milli",
            "seasonal_milli",
            (F.col("__det") - F.col("seasonal_milli")).alias(
                "residual_milli"
            ),
        )
    )


def theil_sen_slope(
    days: DataFrame,
    day_col: str = "day",
    value_col: str = "y",
    n_shards: int = 64,
) -> DataFrame:
    """THEIL–SEN estimator of a daily series' trend: the MEDIAN of all
    pairwise slopes (y_j − y_i)/(day_j − day_i), i < j — the robust
    complement of the OLS slope in ``daily_trend`` (one outlier day
    drags an OLS fit arbitrarily; the pairwise-slope median has a 29%
    breakdown point — Sen 1968).

    Engine-exact core: each pair's slope is carried in integer MICRO
    units as the TRUNCATING quotient ``(Δy·1e6) div Δd`` — Δy can be
    NEGATIVE, and both engines truncate toward zero identically
    (measured round 7: DuckDB // truncates like Spark div; Python's
    // floors — pinned by the negative-slope unit test), and the median is a pure RANK SELECTION at ceil(N/2)
    (lower median, the repo convention) — no value arithmetic, so the
    selected slope is engine-exact. Overflow bound, stated: the micro
    slope needs |Δy|·1e6 < 2^63 (|Δy| < ~9e12 — any daily count and
    all but absurd cent deltas); the selected double round-trips
    exactly below 2^53.

    Output: 1 row (n_days, n_pairs, slope_micro BIGINT); NULL slope
    when fewer than 2 days.

    Scale shape: the input is a per-DAY aggregate (calendar-bounded
    by contract), so the pair self-join is |days|²/2 — bounded by the
    CALENDAR squared (~6.6M pairs for a decade), not by the fact
    table; the median runs through rank.global_percentiles' sharded
    machinery (boundary-literal shards, no single-task sort even over
    the pair frame), sharding on the (slope, xxhash64(d1,d2)) PAIR —
    flat/linear series tie every slope, and single-column range
    shards cannot split equal keys, so the value-only shard
    degenerated to one task (VERDICT r7 defect #1; fixed round 8).
    n_pairs is the closed form n(n−1)/2 — never a second count over
    the pairs."""
    from pyspark import StorageLevel

    from hbase_gis_spark.operators.rank import global_percentiles

    # the day dim is calendar-bounded but its producing aggregate
    # scans the fact table, and the pair frame feeds
    # global_percentiles' two planning jobs plus the lazy selection
    # (each referencing d on BOTH join sides) — persist so the fact
    # scan+aggregate runs once (optimization r11, guide §5)
    d = days.select(
        F.col(day_col).cast("bigint").alias("__d"),
        F.col(value_col).cast("bigint").alias("__y"),
    ).filter(
        F.col("__y").isNotNull() & F.col("__d").isNotNull()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = d.select(F.col("__d").alias("__d1"), F.col("__y").alias("__y1"))
    b = d.select(F.col("__d").alias("__d2"), F.col("__y").alias("__y2"))
    # broadcast the second day frame: the non-equi pair join plans as
    # BroadcastNestedLoopJoin over two calendar-bounded dims (a bare
    # inner theta-join would fall to the banned CartesianProduct);
    # nullif guards the d2 == d1 diagonal — Catalyst pushes the
    # NULL/NaN slope filter INTO the join predicate, where the slope
    # expression evaluates on raw pairs BEFORE the d2 > d1 conjunct
    # (observed ANSI REMAINDER_BY_ZERO; a NULL slope there just drops
    # the diagonal row the condition drops anyway)
    pairs = (
        a.join(F.broadcast(b), F.col("__d2") > F.col("__d1"))
        .withColumn("__num", (F.col("__y2") - F.col("__y1")) * 1_000_000)
        .withColumn("__den", F.nullif(F.col("__d2") - F.col("__d1"), F.lit(0)))
        .select(
            # bare truncating div (engines agree for all signs —
            # measured round 7; agreement pinned by the negative-slope
            # unit test); nullif keeps the pushed-down-filter diagonal
            # from dividing by zero under ANSI
            F.expr("CAST(__num div __den AS BIGINT)").alias("__slope"),
            # deterministic per-pair tiebreak: slopes of a flat or
            # near-linear series are ALL-TIES (equal keys cannot
            # range-split — rank.py's tie-mass contract), so the
            # median selection shards on the (slope, hash) pair
            F.xxhash64(F.col("__d1"), F.col("__d2")).alias("__t"),
        )
    )
    # global_percentiles consumes the slope frame three times
    # (boundary sketch, shard-size offsets, the rank plan); the pair
    # join recomputes per pass DELIBERATELY — it is a broadcast BNLJ
    # of two calendar-bounded day frames, cheaper to replay than to
    # materialize (an interleaved persist A/B showed no win), and the
    # lineage stays trivially recoverable
    med = global_percentiles(
        pairs.select(
            F.col("__slope").cast("double").alias("__slope"), "__t"
        ),
        "__slope",
        {"__m": (1, 2)},
        n_shards,
        tiebreak_col="__t",
    )
    n = d.agg(F.count(F.lit(1)).alias("n_days"))
    return n.crossJoin(F.broadcast(med)).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.expr("CAST(n_days * (n_days - 1) div 2 AS BIGINT)").alias(
            "n_pairs"
        ),
        F.col("__m").cast("bigint").alias("slope_micro"),
    )


def mann_kendall_trend(
    days: DataFrame,
    day_col: str = "day",
    value_col: str = "y",
) -> DataFrame:
    """MANN–KENDALL monotone-trend statistic of a daily series:
    ``S = Σ_{i<j} sign(y_j − y_i)`` and the Kendall
    ``tau = S / (n(n−1)/2)`` — the nonparametric "is this going up"
    test that pairs with :func:`theil_sen_slope` (Theil–Sen says how
    steep; Mann–Kendall says how consistently monotone, immune to the
    series' scale and to any monotone transform of the values).

    Engine-exact: S is an exact BIGINT sum of {-1, 0, +1} (|S| ≤
    n_pairs — never overflows), n_pairs is the closed form n(n−1)/2,
    and ``tau_milli`` is the TRUNCATING quotient
    ``(1000·S) div n_pairs`` — S is routinely NEGATIVE (downtrends),
    and both engines truncate toward zero identically (measured
    round 7: DuckDB // truncates like Spark div; Python's // floors —
    pinned by the negative-tau unit test).

    Output: 1 row (n_days, n_pairs, s_stat, tau_milli); NULL tau when
    fewer than 2 days.

    Scale shape: per-DAY input by contract → the pair self-join is
    calendar²-bounded (the theil_sen argument); ONE aggregate over the
    pairs, no window anywhere."""
    from pyspark import StorageLevel

    # d feeds both pair-join sides and the day count — persist so the
    # fact scan+aggregate runs once (optimization r11)
    d = days.select(
        F.col(day_col).cast("bigint").alias("__d"),
        F.col(value_col).cast("bigint").alias("__y"),
    ).filter(
        F.col("__y").isNotNull() & F.col("__d").isNotNull()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = d.select(F.col("__d").alias("__d1"), F.col("__y").alias("__y1"))
    b = d.select(F.col("__d").alias("__d2"), F.col("__y").alias("__y2"))
    s = (
        a.join(F.broadcast(b), F.col("__d2") > F.col("__d1"))
        .agg(
            F.coalesce(
                F.sum(F.signum(F.col("__y2") - F.col("__y1")).cast("bigint")),
                F.lit(0),
            ).alias("s_stat")
        )
    )
    n = d.agg(F.count(F.lit(1)).alias("n_days"))
    return n.crossJoin(F.broadcast(s)).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.expr("CAST(n_days * (n_days - 1) div 2 AS BIGINT)").alias(
            "n_pairs"
        ),
        F.col("s_stat").cast("bigint").alias("s_stat"),
        F.expr(
            "CASE WHEN n_days >= 2 THEN CAST((1000 * s_stat)"
            " div (n_days * (n_days - 1) div 2) AS BIGINT) END"
        ).alias("tau_milli"),
    )


def kendall_tau_xy(
    days: DataFrame,
    day_col: str = "day",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Bivariate Kendall τ-b between two daily measures — the
    rank-association member the correlation family was missing:
    ``rolling_corr``/``spearman`` measure linear/rank-linear
    co-movement, τ-b counts CONCORDANT vs DISCORDANT pairs, with the
    standard tie correction (τ-b, the one every stats package
    reports) — robust to any monotone transform of either measure
    and exact on ties. :func:`mann_kendall_trend` is the univariate
    special case (y against time, no tie term needed on the
    strictly-increasing day axis).

    Engine-exact integer pieces: C, D, and the tie counts are BIGINT
    pair counts over the day-pair join (each summand is a {0,1}
    indicator built from a sign product, so every count is ≤
    n(n−1)/2 of a per-DAY frame — int64 overflow is impossible
    below ~4·10^9 days); only the final τ-b is a double — two sqrts
    and one divide over exact integers, rounded to 9 (the spearman
    convention). NULL-measure days are dropped
    before pairing (the rolling_corr contract). τ-b is NULL when
    either tie-corrected denominator leg is zero (a constant series
    has no rank signal — the nullif convention).

    Output: 1 row (n_days, n_pairs, n_concordant, n_discordant,
    n_tie_x, n_tie_y, tau_b_r9).

    Scale shape: per-DAY input by contract → the pair self-join is
    calendar²-bounded (the theil_sen/mann_kendall argument, broadcast
    both sides); ONE aggregate over the pairs, no window anywhere."""
    from pyspark import StorageLevel

    # d feeds both pair-join sides — persist so the fact
    # scan+aggregate runs once (optimization r11)
    d = days.select(
        F.col(day_col).cast("bigint").alias("__d"),
        F.col(x_col).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    ).filter(
        F.col("__d").isNotNull()
        & F.col("__x").isNotNull()
        & F.col("__y").isNotNull()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = d.select(
        F.col("__d").alias("__d1"),
        F.col("__x").alias("__x1"),
        F.col("__y").alias("__y1"),
    )
    b = d.select(
        F.col("__d").alias("__d2"),
        F.col("__x").alias("__x2"),
        F.col("__y").alias("__y2"),
    )
    sx = F.signum(F.col("__x2") - F.col("__x1"))
    sy = F.signum(F.col("__y2") - F.col("__y1"))
    pairs = a.join(F.broadcast(b), F.col("__d2") > F.col("__d1")).agg(
        F.coalesce(
            F.sum((sx * sy == 1).cast("bigint")), F.lit(0)
        ).alias("n_concordant"),
        F.coalesce(
            F.sum((sx * sy == -1).cast("bigint")), F.lit(0)
        ).alias("n_discordant"),
        F.coalesce(
            F.sum(((sx == 0) & (sy != 0)).cast("bigint")), F.lit(0)
        ).alias("n_tie_x"),
        F.coalesce(
            F.sum(((sy == 0) & (sx != 0)).cast("bigint")), F.lit(0)
        ).alias("n_tie_y"),
    )
    n = d.agg(F.count(F.lit(1)).alias("n_days"))
    return n.crossJoin(F.broadcast(pairs)).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.expr("CAST(n_days * (n_days - 1) div 2 AS BIGINT)").alias(
            "n_pairs"
        ),
        F.col("n_concordant").cast("bigint").alias("n_concordant"),
        F.col("n_discordant").cast("bigint").alias("n_discordant"),
        F.col("n_tie_x").cast("bigint").alias("n_tie_x"),
        F.col("n_tie_y").cast("bigint").alias("n_tie_y"),
        F.round(
            (F.col("n_concordant") - F.col("n_discordant")).cast("double")
            / F.nullif(
                F.sqrt(
                    (
                        F.col("n_concordant")
                        + F.col("n_discordant")
                        + F.col("n_tie_x")
                    ).cast("double")
                )
                * F.sqrt(
                    (
                        F.col("n_concordant")
                        + F.col("n_discordant")
                        + F.col("n_tie_y")
                    ).cast("double")
                ),
                F.lit(0.0),
            ),
            9,
        ).alias("tau_b_r9"),
    )


def event_debounce(
    events: DataFrame,
    gap_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_us_col: str = "ts_us",
    id_col: str = "event_id",
) -> DataFrame:
    """DEBOUNCE an event stream: within each (user, event_type), an
    event is KEPT iff it is the first of its burst — more than
    ``gap_us`` after the previous event of that key (double-clicks,
    retry storms, and tracking-pixel refires collapse to one event;
    the per-key complement of whole-stream ``sessionize_events``).

    Deterministic order: (ts, event_id) — simultaneous events keep
    the smallest id first and the rest debounce against it. NOTE the
    stated semantics: the gap is measured to the PREVIOUS RAW event
    (trailing-edge debounce, the analytics convention), not to the
    burst's first event — a long slow burst with every inter-arrival
    under gap_us keeps only its first event no matter its total span.

    Output: input key/ts/id columns + ``kept`` boolean — callers
    filter or aggregate (the registered query pins per-key totals).

    Scale shape: ONE shuffle on (user, type); the lag window is
    per-key bounded (a user's own events), never global; the decision
    is pure integer comparison — engine-exact."""
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(ts_us_col).asc(), F.col(id_col).asc()
    )
    prev = F.lag(ts_us_col).over(w)
    return events.select(
        user_col,
        type_col,
        id_col,
        ts_us_col,
        (
            prev.isNull() | (F.col(ts_us_col) - prev > F.lit(gap_us))
        ).alias("kept"),
    )


def churn_hazard(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    day_col: str = "day",
) -> DataFrame:
    """Discrete-time CHURN HAZARD table (the Kaplan–Meier ingredient):
    per customer, observed lifetime = last order day − first order
    day; for every OBSERVED lifetime t, ``hazard(t) = churned(t) /
    at_risk(t)`` where at_risk counts customers whose lifetime is at
    least t. The table a retention model or an LTV discount curve is
    fitted from — per-tenure-day risk, not the survival product
    (cumulative KM products are float-order exposed; the hazard table
    is all-integer and the caller can fold it however it likes).

    Engine-exact: lifetimes, counts and the suffix sum are BIGINTs;
    ``hazard_milli = (1000·churned) div at_risk`` is non-negative, so
    truncate == floor in both engines (stated, not assumed).

    Output: one row per observed lifetime t, ascending —
    (t, churned, at_risk, hazard_milli).

    Scale shape: one customer-keyed aggregate (fact → |customers|),
    one lifetime histogram aggregate (|customers| → |distinct
    lifetimes| ≤ calendar days), then the at_risk suffix sum as a
    triangle self-join over the HISTOGRAM dim (calendar²-bounded,
    the theil_sen argument) — no window, no fact-scale sort."""
    lt = orders.groupBy(F.col(cust_col).alias("__c")).agg(
        (F.max(day_col) - F.min(day_col)).cast("bigint").alias("__lt")
    )
    hist = lt.groupBy("__lt").agg(F.count(F.lit(1)).alias("__churned"))
    a = hist.select(
        F.col("__lt").alias("t"), F.col("__churned").alias("churned")
    )
    b = hist.select(
        F.col("__lt").alias("__l2"), F.col("__churned").alias("__c2")
    )
    # broadcast: non-equi suffix-sum join over the histogram dim —
    # BNLJ (sanctioned, calendar-bounded), never CartesianProduct
    risk = (
        a.join(F.broadcast(b), F.col("__l2") >= F.col("t"))
        .groupBy("t", "churned")
        .agg(F.sum("__c2").alias("at_risk"))
    )
    return risk.select(
        F.col("t"),
        F.col("churned"),
        F.col("at_risk").cast("bigint").alias("at_risk"),
        F.expr("CAST((1000 * churned) div at_risk AS BIGINT)").alias(
            "hazard_milli"
        ),
    ).orderBy(F.col("t").asc())


def daily_fano_factor(
    ev: DataFrame,
    ts_us_col: Column,
    key_col: str = "event_type",
) -> DataFrame:
    """Per-key FANO FACTOR (variance-to-mean ratio) of daily event
    counts over the DENSE day spine — the burstiness index (Poisson
    arrivals give 1; > 1 means clumped traffic / incident storms,
    < 1 means throttled or quota-shaped flow). One number per key
    that tells a capacity planner whether mean-based sizing is safe.

    Engine-exact: counts over the dense spine (zero days INCLUDED —
    omitting them understates variance, the dense_daily_counts
    argument) give exact BIGINT n/Σy; Σy² accumulates in
    DECIMAL(38,0) with the cast BEFORE the multiply (a >3e9-events
    day would wrap int64 y² — the round-7 overflow discipline);
    ``fano = (n·Σy² − (Σy)²) / (n·Σy)`` is ONE double division of
    exact integers, rounded to 9; ``mean_milli = (1000·Σy) div n``
    is non-negative integer arithmetic.

    Output: one row per key — (key, n_days, mean_milli, fano).

    Scale shape: dense_daily_counts' ONE fact aggregate, then a
    |keys|-row rollup; nothing else scales with the table."""
    d = dense_daily_counts(ev, ts_us_col, key_col)
    dec = "decimal(38,0)"
    agg = d.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("__s"),
        F.sum(
            F.col("n_events").cast(dec) * F.col("n_events")
        ).alias("__s2"),
    )
    nd = F.col("n_days").cast("decimal(38,0)")
    num = nd * F.col("__s2") - F.col("__s").cast(dec) * F.col("__s")
    den = nd * F.col("__s")
    return agg.select(
        key_col,
        F.col("n_days").cast("bigint").alias("n_days"),
        F.expr("CAST((1000 * __s) div n_days AS BIGINT)").alias(
            "mean_milli"
        ),
        F.when(
            F.col("__s") > 0,
            F.round(num.cast("double") / den.cast("double"), 9),
        ).alias("fano"),
    )


def changepoint_days(
    ev: DataFrame,
    ts_us_col: Column,
    key_col: str = "event_type",
) -> DataFrame:
    """Per-key LEVEL-SHIFT LOCATION: the day where the CUSUM deviation
    peaks — the single most likely change-point under the binary-
    segmentation criterion — with the before/after daily rates, the
    answer to :func:`cusum_days`' "something shifted" flag ("WHEN did
    it shift, from WHAT rate to WHAT rate"). argmax_k |C_k| is the
    first-split statistic of binary segmentation (Scott & Knott), and
    for a single sustained shift it is the maximum-likelihood split
    day of a Poisson rate model.

    Engine-exact integer core: the scaled statistic
    ``N·prefix_k − k·S`` (BIGINT, the cusum_days form — no division),
    argmax via the grouped min-of-struct top-1 over
    ``(−|cusum|, day)`` (ties → earliest day; a partial aggregate,
    never a per-key sort — the round-7 grouped-top-1 idiom);
    before/after rates are truncating divs of non-negative BIGINTs
    (== floor in both engines), with the post side nullif-guarded
    (k = N only on an all-flat key, where the tie rule picks day 1
    and keeps the guard dead — stated, not assumed).

    Output: one row per key — (key, n_days, n_total, cp_day,
    cp_index, max_abs_cusum_scaled, pre_rate_milli events/day·1000
    through cp_day inclusive, post_rate_milli after it, shift_milli
    = post − pre, signed).

    Scale shape: inherits dense_daily_counts' ONE fact-table hash
    aggregate; the prefix window and the argmax run over the
    |days| x |keys| frame — calendar-bounded, thousands of rows at
    any corpus size."""
    d = dense_daily_counts(ev, ts_us_col, key_col)
    totals = d.groupBy(key_col).agg(
        F.sum("n_events").alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    w = Window.partitionBy(key_col).orderBy(F.col("day").asc())
    staged = (
        d.join(F.broadcast(totals), key_col)
        .select(
            key_col,
            "day",
            "__n",
            "__s",
            F.sum("n_events").over(w).alias("__pre"),
            F.row_number().over(w).cast("bigint").alias("__k"),
        )
        .withColumn(
            "__c", F.col("__n") * F.col("__pre") - F.col("__k") * F.col("__s")
        )
    )
    best = staged.groupBy(key_col, "__n", "__s").agg(
        F.min(
            F.struct(
                (-F.abs(F.col("__c"))).alias("__negabs"),
                F.col("day").alias("__day"),
                F.col("__c").alias("__cv"),
                F.col("__pre").alias("__prefix"),
                F.col("__k").alias("__kk"),
            )
        ).alias("__b")
    )
    return best.select(
        F.col(key_col),
        F.col("__n").cast("bigint").alias("n_days"),
        F.col("__s").cast("bigint").alias("n_total"),
        F.col("__b.__day").cast("bigint").alias("cp_day"),
        F.col("__b.__kk").cast("bigint").alias("cp_index"),
        F.abs(F.col("__b.__cv")).cast("bigint").alias(
            "max_abs_cusum_scaled"
        ),
        F.expr("CAST((1000 * __b.__prefix) div __b.__kk AS BIGINT)").alias(
            "pre_rate_milli"
        ),
        F.expr(
            "CAST((1000 * (__s - __b.__prefix))"
            " div nullif(__n - __b.__kk, 0) AS BIGINT)"
        ).alias("post_rate_milli"),
        (
            F.expr(
                "CAST((1000 * (__s - __b.__prefix))"
                " div nullif(__n - __b.__kk, 0) AS BIGINT)"
            )
            - F.expr("CAST((1000 * __b.__prefix) div __b.__kk AS BIGINT)")
        ).alias("shift_milli"),
    )


def rolling_corr(
    days: DataFrame,
    x_col: str,
    y_col: str,
    window: int = 7,
    day_col: str = "day",
) -> DataFrame:
    """Rolling Pearson correlation between two INTEGER daily series
    over a trailing ``window``-row frame — the "are these two metrics
    still moving together this week?" monitor (volume vs revenue,
    traffic vs errors) that a single whole-history correlation
    number hides.

    Engine-exact discipline: all five sufficient statistics (Σx, Σy,
    Σx², Σy², Σxy) accumulate in DECIMAL(38,0) with the cast BEFORE
    every multiply (the repo-wide overflow rule; safe for |x|,|y| up
    to ~1e15 at window ≤ 28 — stated bound), so the correlation's
    numerator n·Σxy − Σx·Σy and the two radicands are EXACT integers.
    The only floats are the final correctly-rounded casts, two IEEE
    sqrts, one multiply, one divide, rounded to 9 — the spearman_corr
    convention, bit-identical across engines. A zero radicand (a
    constant series in the frame) yields NULL by stated convention
    (the nullif guard), matching SQL corr()'s undefined case.

    Frames are ROW-based over the OBSERVED day sequence in day order
    (gaps don't widen the frame — densify upstream if calendar frames
    are wanted; stated contract), and only FULL frames emit (the
    first window−1 days are warm-up; partial-frame correlations are
    noise and their n < window denominators would differ from the
    documented statistic).

    Scale shape: the input is a |days|-sized aggregate, so the
    partition-less ordered window rides the module's calendar-bounded
    allowlist (the daily_rolling argument) — the frame this runs over
    is dim-sized by construction, never the fact table."""
    # drop incomplete observations BEFORE framing: a NULL x or y would
    # otherwise be skipped by the sums but counted by __n, silently
    # corrupting every statistic its frame touches
    base = days.select(
        F.col(day_col).cast("bigint").alias("day"),
        F.col(x_col).cast("decimal(38,0)").alias("__x"),
        F.col(y_col).cast("decimal(38,0)").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        -(window - 1), Window.currentRow
    )
    s = base.select(
        "day",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum("__x").over(w).alias("__sx"),
        F.sum("__y").over(w).alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).over(w).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).over(w).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).over(w).alias("__sxy"),
    ).filter(F.col("__n") == window)
    num = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den1 = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    den2 = F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return s.select(
        "day",
        F.round(
            num.cast("double")
            / F.nullif(
                F.sqrt(den1.cast("double")) * F.sqrt(den2.cast("double")),
                F.lit(0.0),
            ),
            9,
        ).alias("corr_r9"),
    )
