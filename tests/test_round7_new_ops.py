"""Round-7 operator additions: robust trend (Theil-Sen, Mann-Kendall),
Lorenz curve, position-based attribution, event debounce, t-closeness,
source vocabulary Jaccard, churn hazard."""

import pytest
from pyspark.sql import functions as F


def test_theil_sen_exact_median_and_negative_truncation(spark):
    from hbase_gis_spark.operators.timeseries import theil_sen_slope

    # y = 3d + noise-free -> every pairwise slope is exactly 3e6 micro
    d = spark.createDataFrame(
        [(i, 3 * i + 7) for i in range(10)], "day bigint, y bigint"
    )
    r = theil_sen_slope(d).collect()[0]
    assert (r.n_days, r.n_pairs, r.slope_micro) == (10, 45, 3_000_000)
    # a falling series with a non-divisible slope must TRUNCATE toward
    # zero in both engines: y = -d/3-ish
    d2 = spark.createDataFrame(
        [(0, 0), (3, -1), (6, -2)], "day bigint, y bigint"
    )
    r2 = theil_sen_slope(d2).collect()[0]
    # all pairwise slopes are -1/3: -1e6 div 3 TRUNCATES to -333333 in
    # both engines (Python's // would floor to -333334)
    assert r2.slope_micro == -333333


def test_theil_sen_all_ties_splits_shards(spark):
    """A flat/linear series ties EVERY pairwise slope; the value-only
    range shard cannot split equal keys, so before round 8 the median
    collapsed to one shard and rank.py's tie-mass RuntimeWarning fired
    (VERDICT r7 defect #1). The (slope, xxhash64(d1,d2)) pair shard
    must keep the selection warning-free AND exact."""
    import warnings

    from hbase_gis_spark.operators.timeseries import theil_sen_slope

    flat = spark.createDataFrame(
        [(i, 42) for i in range(40)], "day bigint, y bigint"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        r = theil_sen_slope(flat, n_shards=8).collect()[0]
    assert (r.n_days, r.n_pairs, r.slope_micro) == (40, 780, 0)


def test_mann_kendall_known_series(spark):
    from hbase_gis_spark.operators.timeseries import mann_kendall_trend

    up = spark.createDataFrame(
        [(i, 10 + i) for i in range(6)], "day bigint, y bigint"
    )
    r = mann_kendall_trend(up).collect()[0]
    assert (r.n_days, r.n_pairs, r.s_stat, r.tau_milli) == (6, 15, 15, 1000)
    down = spark.createDataFrame(
        [(i, 10 - i) for i in range(6)], "day bigint, y bigint"
    )
    r2 = mann_kendall_trend(down).collect()[0]
    assert (r2.s_stat, r2.tau_milli) == (-15, -1000)
    # mixed: 1,3,2 -> pairs (1,3)+1 (1,2)+1 (3,2)-1 => S=1, tau=1/3
    mixed = spark.createDataFrame(
        [(0, 1), (1, 3), (2, 2)], "day bigint, y bigint"
    )
    r3 = mann_kendall_trend(mixed).collect()[0]
    assert (r3.s_stat, r3.tau_milli) == (1, 333)
    # negative non-divisible tau truncates toward zero (div-vs-// trap)
    mixed2 = spark.createDataFrame(
        [(0, 3), (1, 1), (2, 2)], "day bigint, y bigint"
    )
    r4 = mann_kendall_trend(mixed2).collect()[0]
    assert (r4.s_stat, r4.tau_milli) == (-1, -333)


def test_lorenz_curve_deciles(spark):
    from hbase_gis_spark.operators.drift import lorenz_curve

    # 10 rows valued 1..10 in 5 buckets of 2: masses 3,7,11,15,19
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 11)], "id bigint, v bigint"
    )
    rows = {
        r.bucket: (r.n_rows, r.bucket_value, r.cum_value, r.cum_share_milli)
        for r in lorenz_curve(df, "v", "id", buckets=5).collect()
    }
    assert rows == {
        1: (2, 3, 3, 54),      # 3000/55 = 54.5 -> 54
        2: (2, 7, 10, 181),    # 10000/55 = 181.8
        3: (2, 11, 21, 381),
        4: (2, 15, 36, 654),
        5: (2, 19, 55, 1000),
    }


def test_lorenz_curve_no_int64_wrap_on_huge_totals(spark):
    """ADVICE r7 #2: bare int64 ``1000 * cum_value`` wrapped silently
    past ~9.2e15 total value while DuckDB's HUGEINT sum stayed exact
    — the DECIMAL(38,0) product (pareto_threshold's guard) must keep
    the share exact."""
    from hbase_gis_spark.operators.drift import lorenz_curve

    big = 5_000_000_000_000_000  # 5e15; 1000 * 1e16 total wraps int64
    df = spark.createDataFrame(
        [(1, big), (2, big)], "id bigint, v bigint"
    )
    rows = {
        r.bucket: (r.cum_value, r.cum_share_milli)
        for r in lorenz_curve(df, "v", "id", buckets=2).collect()
    }
    assert rows == {1: (big, 500), 2: (2 * big, 1000)}


def test_position_attribution_credit_ladder(spark):
    from hbase_gis_spark.operators.funnel import position_attribution

    pairs = spark.createDataFrame(
        # conv 1: one touch; conv 2: two; conv 3: five
        [(1, 10, 100)]
        + [(2, t, 100 + t) for t in (20, 21)]
        + [(3, t, 200 + t) for t in (30, 31, 32, 33, 34)],
        "pid bigint, vid bigint, vus bigint",
    )
    got = {
        (r.pid, r.vid): (r.position, r.n_touches, r.credit_ppm)
        for r in position_attribution(pairs).collect()
    }
    assert got[(1, 10)] == (1, 1, 1_000_000)
    assert got[(2, 20)] == (1, 2, 500_000)
    assert got[(2, 21)] == (2, 2, 500_000)
    assert got[(3, 30)] == (1, 5, 400_000)
    assert got[(3, 34)] == (5, 5, 400_000)
    # middles: 200000 div 3 = 66666 each; books under-add by 2 ppm
    for vid, pos in ((31, 2), (32, 3), (33, 4)):
        assert got[(3, vid)] == (pos, 5, 66_666)


def test_event_debounce_bursts(spark):
    from hbase_gis_spark.operators.timeseries import event_debounce

    rows = [
        # user 1 click burst: 0s, 1s, 2s -> only first kept; 400s -> kept
        (1, "click", 1, 0),
        (1, "click", 2, 1_000_000),
        (1, "click", 3, 2_000_000),
        (1, "click", 4, 400_000_000),
        # different type doesn't debounce against clicks
        (1, "view", 5, 1_500_000),
        # slow burst: every gap under 300s -> only the first survives
        (2, "click", 6, 0),
        (2, "click", 7, 250_000_000),
        (2, "click", 8, 500_000_000),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, event_id bigint, ts_us bigint"
    )
    kept = {
        r.event_id
        for r in event_debounce(df, 300_000_000).collect()
        if r.kept
    }
    assert kept == {1, 4, 5, 6}


def test_t_closeness_skewed_group(spark):
    from hbase_gis_spark.operators.corpus import t_closeness_report

    # corpus: 50/50 a/b overall; group g1 is all-a (tvd = 1/2·(|1-.5|+|0-.5|)
    # = 0.5 -> 500 milli), g2 mirrors with all-b, g3 is balanced (tvd 0)
    rows = (
        [("g1", "a")] * 10
        + [("g2", "b")] * 10
        + [("g3", "a")] * 5
        + [("g3", "b")] * 5
    )
    df = spark.createDataFrame(rows, "grp string, sens string")
    got = {
        r.grp: (r.n_rows, r.tvd_milli)
        for r in t_closeness_report(df, ["grp"], "sens", t_milli=100).collect()
    }
    assert got == {"g1": (10, 500), "g2": (10, 500)}
    # threshold above 500 -> clean report
    assert (
        t_closeness_report(df, ["grp"], "sens", t_milli=500).count() == 0
    )


def test_t_closeness_null_quasi_group_reported(spark):
    """ADVICE r7 #3: the NULL quasi-key group — the catch-all bucket
    k_anonymity DOES report — must not vanish from the tvd audit
    through a non-null-safe join."""
    from hbase_gis_spark.operators.corpus import t_closeness_report

    rows = (
        [(None, "a")] * 10
        + [("g2", "b")] * 10
        + [("g3", "a")] * 5
        + [("g3", "b")] * 5
    )
    df = spark.createDataFrame(rows, "grp string, sens string")
    got = {
        r.grp: (r.n_rows, r.tvd_milli)
        for r in t_closeness_report(df, ["grp"], "sens", t_milli=100).collect()
    }
    # the all-a NULL group skews exactly like g1 did: tvd 500 milli
    assert got == {None: (10, 500), "g2": (10, 500)}


def test_source_vocab_jaccard_pairs(spark):
    from hbase_gis_spark.operators.textstats import source_vocab_jaccard

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "b c d", "s2"),
            (3, "x y", "s3"),
        ],
        "doc_id bigint, text string, source string",
    )
    got = {
        (r.source_a, r.source_b): (r.sz_a, r.sz_b, r.inter, r.jaccard_milli)
        for r in source_vocab_jaccard(df).collect()
    }
    assert got[("s1", "s2")] == (3, 3, 2, 500)   # {b,c} / {a,b,c,d}
    assert got[("s1", "s3")] == (3, 2, 0, 0)
    assert got[("s2", "s3")] == (3, 2, 0, 0)


def test_churn_hazard_table(spark):
    from hbase_gis_spark.operators.timeseries import churn_hazard

    # lifetimes: c1 0 days (single order), c2 0, c3 5, c4 10
    rows = [
        (1, 100), (2, 200), (3, 300), (3, 305), (4, 400), (4, 410),
    ]
    df = spark.createDataFrame(rows, "o_custkey bigint, day bigint")
    got = {
        r.t: (r.churned, r.at_risk, r.hazard_milli)
        for r in churn_hazard(df).collect()
    }
    assert got == {
        0: (2, 4, 500),
        5: (1, 2, 500),
        10: (1, 1, 1000),
    }


def test_sequence_gap_audit(spark):
    from hbase_gis_spark.operators.quality import sequence_gap_audit

    df = spark.createDataFrame(
        [(1,), (2,), (2,), (5,), (7,)], "id bigint"
    )
    r = sequence_gap_audit(df, "id").collect()[0]
    # span 1..7 = 7 slots, 4 distinct -> 3 missing; 5 rows -> 1 dup
    assert tuple(r) == (5, 4, 1, 7, 3, 1)


def test_pareto_threshold_exact_prefix(spark):
    from hbase_gis_spark.operators.drift import pareto_threshold

    # values 100, 50, 30, 15, 5 (total 200); 80% = 160:
    # prefixes (exclusive): 0, 100, 150, 180 -> k = 3 (100+50+30=180>=160,
    # and row 4's prefix 180 >= 160 stops it)
    df = spark.createDataFrame(
        [(1, 100), (2, 50), (3, 30), (4, 15), (5, 5)],
        "id bigint, v bigint",
    )
    r = pareto_threshold(df, "v", "id", share_milli=800).collect()[0]
    assert tuple(r) == (5, 200, 3, 600)
    # ties broken by id: equal values must count deterministically
    df2 = spark.createDataFrame(
        [(i, 10) for i in range(1, 11)], "id bigint, v bigint"
    )
    r2 = pareto_threshold(df2, "v", "id", share_milli=500).collect()[0]
    assert (r2.k_rows, r2.k_frac_milli) == (5, 500)


def test_heaps_law_synthetic_growth(spark):
    from hbase_gis_spark.operators.textstats import heaps_law_fit

    # sub-linear vocab growth: doc i contributes i//2 repeated tokens
    # plus a couple of fresh ones — slope must land strictly in (0, 1)
    rows = [
        (
            i,
            " ".join(["common"] * (2 + i))
            + f" fresh{i}a fresh{i}b"
            + (" extra" + str(i // 3) if i % 3 == 0 else ""),
        )
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    r = heaps_law_fit(df, n_points=8).collect()[0]
    assert r.n_points == 8
    assert 0.0 < r.slope < 1.0


def test_daily_fano_factor_dense_zero_days(spark):
    from pyspark.sql import functions as F

    from hbase_gis_spark.operators.timeseries import daily_fano_factor

    # type "a": 4 events on day 0 of a 3-day span (bursty, fano > 1);
    # type "b": 1 event on each of days 0..2 (uniform, fano == 0)
    us = 86_400_000_000
    rows = (
        [(1, "a", 0)] * 4
        + [(2, "b", 0), (3, "b", us), (4, "b", 2 * us)]
    )
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, us bigint"
    )
    got = {
        r.event_type: (r.n_days, r.mean_milli, r.fano)
        for r in daily_fano_factor(df, F.col("us")).collect()
    }
    # a: counts [4,0,0] -> n=3, s=4, s2=16: fano = (3*16-16)/(3*4)
    assert got["a"] == (3, 1333, round(32 / 12, 9))
    assert got["b"] == (3, 1000, 0.0)
