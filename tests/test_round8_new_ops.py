"""Round-8 operator additions: IVF maintenance, curation funnel,
entropy rate, change-point location, dedup threshold sweep."""

import pytest
from pyspark.sql import functions as F


def test_changepoint_days_level_shift(spark):
    """10 days at rate 2 then 10 days at rate 8: the CUSUM peak sits
    on the last low day, the rates bracket the shift exactly."""
    from datetime import datetime, timedelta

    from hbase_gis_spark.operators.timeseries import changepoint_days

    base = datetime(2026, 1, 1)
    rows = []
    eid = 0
    for day in range(20):
        rate = 2 if day < 10 else 8
        for j in range(rate):
            rows.append((eid, base + timedelta(days=day, hours=j), "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )
    r = changepoint_days(ev, F.unix_micros(F.col("ts"))).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_days, row.n_total, row.cp_index) == (20, 100, 10)
    # through day 10: 20 events / 10 days = 2000 milli; after: 80/10
    assert (row.pre_rate_milli, row.post_rate_milli) == (2000, 8000)
    assert row.shift_milli == 6000
    # scaled statistic at k=10: N*prefix - k*S = 20*20 - 10*100 = -600
    assert row.max_abs_cusum_scaled == 600


def test_changepoint_days_flat_series_ties_to_first_day(spark):
    """An all-flat key has cusum 0 everywhere; the tie rule must pick
    the EARLIEST day (keeping the post-side guard dead for N > 1)."""
    from datetime import datetime, timedelta

    from hbase_gis_spark.operators.timeseries import changepoint_days

    base = datetime(2026, 1, 1)
    rows = [
        (d * 3 + j, base + timedelta(days=d, hours=j), "view")
        for d in range(5)
        for j in range(3)
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )
    row = changepoint_days(ev, F.unix_micros(F.col("ts"))).collect()[0]
    assert row.cp_index == 1 and row.max_abs_cusum_scaled == 0
    assert row.pre_rate_milli == 3000 and row.post_rate_milli == 3000


def test_dedup_threshold_curve_monotone_and_exact(spark):
    """Counts are non-increasing in the threshold and agree with a
    brute-force pair enumeration at every grid point."""
    from itertools import combinations

    from hbase_gis_spark.operators.dedup import dedup_threshold_curve

    docs = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),   # high overlap with 1
        (3, "a b c d q r s t"),   # medium overlap with 1/2
        (4, "z y x w v u t q"),   # low overlap
        (5, "m n o p m n o p"),   # disjoint from all
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    def shingles(t, n=3):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    exact = {}
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = shingles(ta), shingles(tb)
        u = len(sa | sb)
        j = len(sa & sb) / u if u else 0.0
        if j >= 0.3:
            exact[(ia, ib)] = j
    got = {
        r.t_milli: (r.n_pairs, r.n_docs_dropped)
        for r in dedup_threshold_curve(df).collect()
    }
    assert set(got) == set(range(300, 951, 50))
    for t in got:
        pairs_t = {k: v for k, v in exact.items() if v * 1000 >= t}
        dropped = {b for (_, b) in pairs_t}
        assert got[t] == (len(pairs_t), len(dropped)), t
    np_seq = [got[t][0] for t in sorted(got)]
    assert np_seq == sorted(np_seq, reverse=True)


def test_packing_stats_hand_counts(spark):
    """One shard, seq_len 10, docs of 4/5/3/9 tokens: 21 tokens fill
    ceil(21/10)=3 seqs with 9 tail pad; the 5-token doc straddles the
    first boundary and the 9-token doc the second."""
    from hbase_gis_spark.operators.textstats import packing_stats

    df = spark.createDataFrame(
        [
            (0, "a b c d"),          # [0,4)
            (1, "a b c d e"),        # [4,9)  -> no cross (9 < 10)
            (2, "a b c"),            # [9,12) -> crosses 10
            (3, "a b c d e f g h i"),  # [12,21) -> crosses 20
        ],
        "doc_id bigint, text string",
    )
    r = packing_stats(df, 10, n_shards=1).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.shard, row.n_docs, row.n_tokens) == (0, 4, 21)
    assert (row.n_seqs, row.tail_waste, row.n_boundary_docs) == (3, 9, 2)


def test_star_components_matches_label_propagation(spark):
    """Star contraction and hash-to-min agree on random graphs
    (labels = component min), including multi-component and
    singleton-free frames."""
    import random

    from hbase_gis_spark.operators.dedup import (
        near_dup_clusters,
        star_components,
    )

    rng = random.Random(7)
    nodes = list(range(1, 120))
    pairs = set()
    for _ in range(140):
        a, b = rng.sample(nodes, 2)
        pairs.add((min(a, b), max(a, b)))
    pdf = spark.createDataFrame(
        sorted(pairs), "id_a bigint, id_b bigint"
    )
    ids = spark.createDataFrame([(n,) for n in nodes], "doc_id bigint")
    want = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(ids, pdf, id_col="doc_id").collect()
    }
    got = {r.id: r.cluster_id for r in star_components(pdf).collect()}
    # star_components only labels nodes appearing in pairs
    touched = {a for a, _ in pairs} | {b for _, b in pairs}
    assert got == {n: want[n] for n in touched}


def test_near_dup_clusters_high_diameter_stall_fallback(spark):
    """A 60x60 grid-mesh component has diameter ~120: pure label
    propagation advances one hop per round (the round-8 sf1 probe's
    dbscan finding), so the stall detector must hand off to star
    contraction and still converge inside max_iter with the exact
    component min everywhere."""
    from pyspark.sql import functions as F

    from hbase_gis_spark.operators.dedup import near_dup_clusters

    n = 60
    # scramble ids so label-value shortcuts can't accidentally help
    def nid(r, c):
        return ((r * 7919 + c * 104729) % 1_000_003) * 10_000 + r * n + c

    edges = []
    for r in range(n):
        for c in range(n):
            if r + 1 < n:
                edges.append((nid(r, c), nid(r + 1, c)))
            if c + 1 < n:
                edges.append((nid(r, c), nid(r, c + 1)))
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a bigint, id_b bigint"
    )
    all_ids = sorted({nid(r, c) for r in range(n) for c in range(n)})
    ids = spark.createDataFrame([(i,) for i in all_ids], "doc_id bigint")
    out = near_dup_clusters(ids, pairs, id_col="doc_id", max_iter=25)
    labels = {r.doc_id: r.cluster_id for r in out.collect()}
    assert set(labels.values()) == {min(all_ids)}


def test_time_decay_attribution_hand_journeys(spark):
    """Three hand-built journeys pin the stepwise-decay contract:
    a lone touch takes the full pot; a 0-vs-1-half-life pair splits
    2:1 with floor remainders; a touch past max_steps half-lives
    saturates at weight 1."""
    from hbase_gis_spark.operators.funnel import time_decay_attribution

    HL = 1_000_000  # 1s half-life for readable fixtures
    pairs = spark.createDataFrame(
        [
            # journey A: one touch, 0 gap -> full pot
            (1, 101, 10 * HL, 10 * HL),
            # journey B: touch at conv (steps 0, w 16) + one half-life
            # earlier (steps 1, w 8) -> 2:1 split, floors stated
            (2, 201, 20 * HL, 20 * HL),
            (2, 202, 19 * HL, 20 * HL),
            # journey C: gap of 9 half-lives saturates at steps=4, w=1,
            # against a steps-0 partner (w 16)
            (3, 301, 30 * HL, 30 * HL),
            (3, 302, 21 * HL, 30 * HL),
        ],
        "pid bigint, vid bigint, vus bigint, pus bigint",
    )
    out = {
        (r.pid, r.vid): r
        for r in time_decay_attribution(
            pairs, half_life_us=HL, max_steps=4
        ).collect()
    }
    assert out[(1, 101)].credit_ppm == 1_000_000
    assert out[(2, 201)].weight == 16 and out[(2, 202)].weight == 8
    assert out[(2, 201)].credit_ppm == 16 * 1_000_000 // 24  # 666666
    assert out[(2, 202)].credit_ppm == 8 * 1_000_000 // 24  # 333333
    assert out[(3, 302)].steps == 4 and out[(3, 302)].weight == 1
    assert out[(3, 301)].credit_ppm == 16 * 1_000_000 // 17
    assert out[(3, 302)].credit_ppm == 1_000_000 // 17
    # books never over-add, and under-add by < k per journey
    for pid, k in [(1, 1), (2, 2), (3, 2)]:
        tot = sum(v.credit_ppm for kk, v in out.items() if kk[0] == pid)
        assert 1_000_000 - k < tot <= 1_000_000


def test_incremental_rollup_matches_full_recompute(spark):
    """Folding a delta batch into a stored rollup reproduces the full
    recompute exactly — including new keys, NULL keys, and NULL
    measures."""
    from hbase_gis_spark.operators.merge import incremental_rollup

    hist = spark.createDataFrame(
        [
            ("a", 1, 10),
            ("a", 1, None),  # NULL measure: counts, adds nothing
            ("b", 2, 5),
            (None, 1, 7),  # NULL key group
        ],
        "k string, d int, v int",
    )
    batch = spark.createDataFrame(
        [("a", 1, 3), ("c", 9, 4), (None, 1, 1)],
        "k string, d int, v int",
    )
    stored = hist.groupBy("k", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("v").cast("bigint").alias("v"),
    )
    got = {
        (r.k, r.d): (r.n_rows, r.v)
        for r in incremental_rollup(
            stored, batch, ["k", "d"], count_col="n_rows", sum_cols=["v"]
        ).collect()
    }
    full = {
        (r.k, r.d): (r.n_rows, r.v)
        for r in hist.unionByName(batch)
        .groupBy("k", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("v").cast("bigint").alias("v"),
        )
        .collect()
    }
    assert got == full
    assert got[("c", 9)] == (1, 4)  # delta-only key appears
    assert got[(None, 1)] == (2, 8)  # NULL keys collide across sides
    assert got[("a", 1)] == (3, 13)  # NULL measure counted, not summed


def test_forget_audit_counts_and_absent_keys(spark):
    """Per-table blast radius: rows and distinct present keys; a
    forget key with no rows contributes to neither, and an empty
    forget set yields a (0, 0) row, not a missing table."""
    from hbase_gis_spark.operators.quality import forget_audit

    t1 = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "uid bigint, x string"
    )
    t2 = spark.createDataFrame([(7, "z")], "uid bigint, x string")
    keys = spark.createDataFrame([(1,), (3,), (99,)], "k bigint").select(
        "k"
    )
    empty = spark.createDataFrame([], "k bigint")
    got = {
        r.table_name: (r.n_rows, r.n_keys)
        for r in forget_audit(
            [("t1", t1, "uid", keys), ("t2", t2, "uid", empty)]
        ).collect()
    }
    assert got == {"t1": (3, 2), "t2": (0, 0)}


def test_rolling_corr_exact_known_series(spark):
    """Perfectly linear frames give ±1.0 exactly, constant frames
    give NULL (zero radicand), and warm-up rows don't emit."""
    from hbase_gis_spark.operators.timeseries import rolling_corr

    rows = [
        # days 0-3: y = 2x + 1 -> corr exactly 1.0 once frame fills
        (0, 1, 3),
        (1, 2, 5),
        (2, 3, 7),
        (3, 5, 11),
        # days 4-6 make a frame where y falls as x rises
        (4, 10, 1),
        (5, 11, 0),
        (6, 12, -1),
    ]
    days = spark.createDataFrame(rows, "day bigint, x bigint, y bigint")
    out = {
        r.day: r.corr_r9
        for r in rolling_corr(days, "x", "y", window=3).collect()
    }
    assert set(out) == {2, 3, 4, 5, 6}  # days 0-1 are warm-up
    assert out[2] == 1.0 and out[3] == 1.0
    assert out[6] == -1.0  # frame 4-6 is exactly anti-linear
    const = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 5), (2, 3, 5)], "day bigint, x bigint, y bigint"
    )
    got = rolling_corr(const, "x", "y", window=3).collect()
    assert len(got) == 1 and got[0].corr_r9 is None


def test_weighted_sample_k_race_properties(spark):
    """The ticket race is deterministic, respects weights on average
    (a weight-8 item outranks a weight-1 item in ~8/9 of salts), and
    plans as a bounded top-k, not a global sort."""
    from hbase_gis_spark.operators.corpus import weighted_sample_k

    items = spark.createDataFrame(
        [(i, 8 if i == 0 else 1) for i in range(20)], "id bigint, w int"
    )
    # determinism: same inputs -> same winners
    a = [r.id for r in weighted_sample_k(items, 5, "w", id_col="id").collect()]
    b = [r.id for r in weighted_sample_k(items, 5, "w", id_col="id").collect()]
    assert a == b and len(a) == 5
    # weight floor/cap: nonpositive weights get 1 ticket, huge get cap
    wild = spark.createDataFrame(
        [(1, -5), (2, 0), (3, 10**9)], "id bigint, w bigint"
    )
    got = {
        r.id: r.weight
        for r in weighted_sample_k(
            wild, 3, "w", id_col="id", max_weight=8
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 8}
    # heavy item wins the top slot for most salts (races are odds,
    # not guarantees; 30 salts at 8:1 odds make a miss astronomically
    # unlikely to happen >12 times)
    wins = 0
    two = spark.createDataFrame([(0, 8), (1, 1)], "id bigint, w int")
    for s in range(30):
        top = weighted_sample_k(
            two, 1, "w", id_col="id", salt=f"s{s}"
        ).collect()[0]
        wins += top.id == 0
    assert wins >= 18
    plan = weighted_sample_k(items, 5, "w", id_col="id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_srm_check_exact_chi2_and_missing_arm(spark):
    """Hand-computable chi-square pieces; an arm with zero
    assignments still appears (the worst SRM is a missing arm); bad
    weights raise."""
    import pytest as _pytest

    from hbase_gis_spark.operators.quality import srm_check

    # 90 A + 10 B against a configured 50/50: N=100, T=2
    rows = [("A",)] * 90 + [("B",)] * 10
    df = spark.createDataFrame(rows, "arm string")
    got = {
        r.arm: (r.n_units, r.expected_units_milli, r.chi2_contrib_micro)
        for r in srm_check(df, "arm", {"A": 1, "B": 1}).collect()
    }
    # exp = 50 each; contrib = (n*2 - 100)^2 * 1e6 / (100*1*2)
    assert got["A"] == (90, 50000, (80**2) * 1_000_000 // 200)
    assert got["B"] == (10, 50000, (80**2) * 1_000_000 // 200)
    # arm C configured but never observed -> row with n=0, full
    # expectation as its contribution
    got3 = {
        r.arm: (r.n_units, r.chi2_contrib_micro)
        for r in srm_check(df, "arm", {"A": 1, "B": 1, "C": 2}).collect()
    }
    assert got3["C"][0] == 0
    # contrib for C: (0*4 - 100*2)^2 * 1e6 // (100*2*4)
    assert got3["C"][1] == (200**2) * 1_000_000 // 800
    # an arm the CONFIG never named (typo'd bucket) must surface with
    # its count and NULL expectation, and its units stay in N: 90 A +
    # 10 X against a 50/50 A/B config expects 50 per configured arm
    rows_x = [("A",)] * 90 + [("X",)] * 10
    dfx = spark.createDataFrame(rows_x, "arm string")
    gotx = {
        r.arm: (r.n_units, r.expected_units_milli, r.chi2_contrib_micro)
        for r in srm_check(dfx, "arm", {"A": 1, "B": 1}).collect()
    }
    assert set(gotx) == {"A", "B", "X"}
    assert gotx["X"] == (10, None, None)
    assert gotx["A"] == (90, 50000, (80**2) * 1_000_000 // 200)
    assert gotx["B"] == (0, 50000, (100**2) * 1_000_000 // 200)
    with _pytest.raises(ValueError):
        srm_check(df, "arm", {"A": 1, "B": 0})


def test_mmr_rerank_diversity_and_lambda_limits(spark):
    """λ=1 reduces MMR to pure cosine order; at moderate λ a planted
    near-duplicate of the top hit is demoted below a less-similar but
    novel candidate; k caps output; ranks are 1..k."""
    import numpy as np

    from hbase_gis_spark.operators.retrieval import mmr_rerank

    rng = np.random.default_rng(5)
    q = np.array([1.0, 0.0, 0.0, 0.0])
    vecs = {
        0: q,  # the query itself (excluded)
        1: np.array([0.99, 0.14, 0.0, 0.0]),  # best hit
        2: np.array([0.99, 0.141, 0.001, 0.0]),  # its near-duplicate
        3: np.array([0.80, -0.6, 0.0, 0.0]),  # novel direction
        4: np.array([0.75, 0.0, 0.66, 0.0]),  # another novel one
    }
    rows = [
        (i, [float(x) for x in v / np.linalg.norm(v)])
        for i, v in vecs.items()
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    pure = [
        r.vec_id
        for r in mmr_rerank(
            df, 0, 4, fetch_k=10, lam_ppm=1_000_000
        ).collect()
    ]
    assert pure == [1, 2, 3, 4]  # λ=1: relevance order

    mmr = [
        r.vec_id
        for r in mmr_rerank(df, 0, 4, fetch_k=10, lam_ppm=500_000).collect()
    ]
    # the near-duplicate (2) must not directly follow its twin (1)
    assert mmr[0] == 1 and mmr[1] != 2 and set(mmr) == {1, 2, 3, 4}

    capped = mmr_rerank(df, 0, 2, fetch_k=10).collect()
    assert [r.rank for r in capped] == [1, 2]


def test_ablation_ladder_nesting_and_stability(spark):
    """Rung membership is NESTED (every rung-f member set contains
    all smaller rungs' members), append-stable (adding rows never
    changes existing rungs), and roughly proportional."""
    from hbase_gis_spark.operators.corpus import ablation_ladder

    frs = (100_000, 200_000, 400_000)
    df = spark.createDataFrame(
        [(i,) for i in range(4000)], "doc_id bigint"
    )
    got = {
        r.doc_id: r.rung_ppm for r in ablation_ladder(df, frs).collect()
    }
    members = {
        f: {d for d, r in got.items() if r <= f} for f in frs
    }
    assert members[100_000] <= members[200_000] <= members[400_000]
    # proportionality within a loose md5-uniformity band
    for f in frs:
        share = len(members[f]) / 4000
        assert abs(share - f / 1_000_000) < 0.03, (f, share)
    # append stability: the first half's rungs are identical inside
    # the doubled corpus
    half = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    got_half = {
        r.doc_id: r.rung_ppm
        for r in ablation_ladder(half, frs).collect()
    }
    assert got_half == {d: r for d, r in got.items() if d < 2000}


def test_mmr_rerank_zero_norm_vectors_excluded(spark):
    """Zero-norm vectors (NaN cosine) are excluded by contract — they
    must neither win a slot nor crash the greedy; a zero-norm QUERY
    yields an empty result."""
    from hbase_gis_spark.operators.retrieval import mmr_rerank

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # zero norm -> NaN rel
            (3, [0.5, 0.5]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    got = [r.vec_id for r in mmr_rerank(df, 0, 4, fetch_k=10).collect()]
    assert 2 not in got and set(got) == {1, 3}
    zero_q = [r for r in mmr_rerank(df, 2, 4, fetch_k=10).collect()]
    assert zero_q == []


def test_time_decay_attribution_malformed_pair_clamps(spark):
    """A touch AFTER the conversion (malformed upstream join) clamps
    to steps=0 / full weight instead of widening the shift — Spark's
    32-bit shiftleft would silently wrap where DuckDB raises, so the
    clamp is the cross-engine safety (comment in funnel.py)."""
    from hbase_gis_spark.operators.funnel import time_decay_attribution

    HL = 1_000_000
    pairs = spark.createDataFrame(
        # touch 100 half-lives AFTER conversion: steps would be -100
        [(1, 11, 200 * HL, 100 * HL), (1, 12, 100 * HL, 100 * HL)],
        "pid bigint, vid bigint, vus bigint, pus bigint",
    )
    out = {
        r.vid: r
        for r in time_decay_attribution(
            pairs, half_life_us=HL, max_steps=4
        ).collect()
    }
    assert out[11].steps == 0 and out[11].weight == 16
    assert out[12].steps == 0 and out[12].weight == 16
    assert out[11].credit_ppm == out[12].credit_ppm == 500_000


def test_mmr_rerank_multi_matches_single_query(spark):
    """The bulk variant's per-query results are identical to the
    single-query operator for every query in the batch."""
    import numpy as np

    from hbase_gis_spark.operators.retrieval import (
        mmr_rerank,
        mmr_rerank_multi,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(6)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qids = [0, 7, 13]
    bulk = mmr_rerank_multi(df, qids, 5, fetch_k=12, lam_ppm=600_000)
    got = {
        qid: [
            (r.rank, r.vec_id, r.rel_r9)
            for r in sorted(
                bulk.filter(F.col("query_id") == qid).collect(),
                key=lambda r: r.rank,
            )
        ]
        for qid in qids
    }
    for qid in qids:
        single = [
            (r.rank, r.vec_id, r.rel_r9)
            for r in sorted(
                mmr_rerank(
                    df, qid, 5, fetch_k=12, lam_ppm=600_000
                ).collect(),
                key=lambda r: r.rank,
            )
        ]
        assert got[qid] == single, qid


def test_incremental_rollup_min_max_append_only(spark):
    """Append-only min/max merge: stored extremes fold with batch
    extremes to the full-recompute extremes, including a column asked
    for under BOTH laws (auto min_/max_ aliases) and NULL measures."""
    from hbase_gis_spark.operators.merge import incremental_rollup

    hist = spark.createDataFrame(
        [("a", 5, 10), ("a", 1, None), ("b", 7, 2)],
        "k string, ts int, v int",
    )
    batch = spark.createDataFrame(
        [("a", 3, -4), ("b", 9, None), ("c", 2, 0)],
        "k string, ts int, v int",
    )
    stored = hist.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("v").cast("bigint").alias("v"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    got = {
        r.k: (r.n_rows, r.v, r.min_ts, r.max_ts)
        for r in incremental_rollup(
            stored, batch, ["k"], count_col="n_rows", sum_cols=["v"],
            min_cols=["ts"], max_cols=["ts"],
        ).collect()
    }
    assert got == {
        "a": (3, 6, 1, 5),
        "b": (2, 2, 7, 9),
        "c": (1, 0, 2, 2),
    }


def test_incremental_rollup_rejects_retraction_with_min_max(spark):
    """The append-only contract is enforced at plan time: a delta
    carrying the tombstone marker raises when min/max measures are
    requested (a retraction cannot un-take a stored min)."""
    import pytest

    from hbase_gis_spark.operators.merge import incremental_rollup

    stored = spark.createDataFrame(
        [("a", 2, 7, 1)], "k string, n_rows bigint, v bigint, ts int"
    )
    delta = spark.createDataFrame(
        [("a", 3, 5, True)], "k string, v int, ts int, __deleted boolean"
    )
    with pytest.raises(ValueError, match="retraction marker"):
        incremental_rollup(
            stored, delta, ["k"], sum_cols=["v"], min_cols=["ts"]
        )
    # and a sum/min-max column collision is rejected up front, not at
    # unionByName time with a duplicate-alias error
    with pytest.raises(ValueError, match="both sum and"):
        incremental_rollup(
            stored, delta.drop("__deleted"), ["k"],
            sum_cols=["v"], max_cols=["v"],
        )


def test_incremental_rollup_signed_retraction_additive(spark):
    """Tombstoned delta rows fold into count/sum partials with sign -1
    (signed-delta view maintenance) and match a full recompute over
    history minus the retracted rows."""
    from hbase_gis_spark.operators.merge import incremental_rollup

    hist = spark.createDataFrame(
        [("a", 10), ("a", 4), ("b", 7)], "k string, v int"
    )
    stored = hist.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("v").cast("bigint").alias("v"),
    )
    # retract ("a", 4), insert ("b", 1) and ("c", 5); NULL marker = insert
    delta = spark.createDataFrame(
        [("a", 4, True), ("b", 1, False), ("c", 5, None)],
        "k string, v int, __deleted boolean",
    )
    got = {
        r.k: (r.n_rows, r.v)
        for r in incremental_rollup(
            stored, delta, ["k"], sum_cols=["v"]
        ).collect()
    }
    assert got == {"a": (1, 10), "b": (2, 8), "c": (1, 5)}


def test_apply_forget_closes_the_audit_loop(spark):
    """audit(n>0) -> apply_forget -> audit(0, 0); NULL keys are never
    dropped under a keyed forget request."""
    from hbase_gis_spark.operators.quality import apply_forget, forget_audit

    t = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (3, "d")],
        "uid bigint, x string",
    )
    keys = spark.createDataFrame([(1,), (3,)], "k bigint")
    before = forget_audit([("t", t, "uid", keys)]).collect()[0]
    assert (before.n_rows, before.n_keys) == (2, 2)
    cleaned = apply_forget(t, "uid", keys)
    keyf = lambda p: (p[0] is None, p[0] or 0, p[1])  # noqa: E731
    assert sorted(
        ((r.uid, r.x) for r in cleaned.collect()), key=keyf
    ) == sorted([(2, "b"), (None, "c")], key=keyf)
    after = forget_audit([("t", cleaned, "uid", keys)]).collect()[0]
    assert (after.n_rows, after.n_keys) == (0, 0)
