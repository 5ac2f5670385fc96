"""Round-9 operator tests: exact two-sample KS drift, Kendall τ-b,
and deterministic contrastive negative sampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hbase_gis_spark.operators.corpus import negative_sample_k
from hbase_gis_spark.operators.drift import ks_two_sample
from hbase_gis_spark.operators.timeseries import kendall_tau_xy


def _ks(spark, ref_rows, cur_rows):
    ref = spark.createDataFrame(
        [("k", v) for v in ref_rows], "k string, v int"
    )
    cur = spark.createDataFrame(
        [("k", v) for v in cur_rows], "k string, v int"
    )
    return {
        r.k: (r.n_ref, r.n_cur, r.ks_micro, r.ks_at_value)
        for r in ks_two_sample(ref, cur, "k", "v").collect()
    }


def test_ks_identical_cohorts_zero(spark):
    got = _ks(spark, [1, 2, 3, 3], [1, 2, 3, 3])
    assert got == {"k": (4, 4, 0, None)} or got["k"][:3] == (4, 4, 0)


def test_ks_disjoint_supports_full(spark):
    got = _ks(spark, [1, 2], [10, 11])
    # ref CDF reaches 1 at v=2 while cur is still 0 -> sup = 1 at 2
    assert got["k"] == (2, 2, 1_000_000, 2)


def test_ks_hand_case_and_sup_location(spark):
    # ref {1,2}, cur {2,3}: D(1)=|1*2-0*2|=2, D(2)=|2*2-1*2|=2,
    # D(3)=0 -> max 2 of 4 = 500000, first achieved at v=1
    got = _ks(spark, [1, 2], [2, 3])
    assert got["k"] == (2, 2, 500_000, 1)


def test_ks_one_sided_key_and_nulls(spark):
    ref = spark.createDataFrame(
        [("only_ref", 1), ("both", 5), ("both", None)],
        "k string, v int",
    )
    cur = spark.createDataFrame(
        [("both", 5), ("only_cur", 9)], "k string, v int"
    )
    got = {
        r.k: (r.n_ref, r.n_cur, r.ks_micro)
        for r in ks_two_sample(ref, cur, "k", "v").collect()
    }
    # NULL measure dropped: 'both' has ONE ref row, identical to cur
    assert got["both"] == (1, 1, 0)
    assert got["only_ref"] == (1, 0, 1_000_000)
    assert got["only_cur"] == (0, 1, 1_000_000)


def _tau(spark, rows):
    df = spark.createDataFrame(rows, "day int, x int, y int")
    return kendall_tau_xy(df, "day", "x", "y").collect()[0]


def test_kendall_perfect_and_reversed(spark):
    up = _tau(spark, [(1, 1, 10), (2, 2, 20), (3, 3, 30)])
    assert (up.n_days, up.n_pairs, up.n_concordant, up.n_discordant) == (
        3, 3, 3, 0,
    )
    assert up.tau_b_r9 == 1.0
    down = _tau(spark, [(1, 1, 30), (2, 2, 20), (3, 3, 10)])
    assert down.tau_b_r9 == -1.0


def test_kendall_tie_correction_matches_closed_form(spark):
    # x: 1,1,2,3 ; y: 1,2,2,3 -> pairs: (12):tx (sx=0,sy>0), (13):C,
    # (14):C, (23):ty, (24):C, (34):C -> C=4 D=0 Tx=1 Ty=1
    r = _tau(spark, [(1, 1, 1), (2, 1, 2), (3, 2, 2), (4, 3, 3)])
    assert (r.n_concordant, r.n_discordant, r.n_tie_x, r.n_tie_y) == (
        4, 0, 1, 1,
    )
    expect = round(4.0 / (math.sqrt(5.0) * math.sqrt(5.0)), 9)
    assert r.tau_b_r9 == expect


def test_kendall_constant_series_null(spark):
    r = _tau(spark, [(1, 5, 1), (2, 5, 2), (3, 5, 3)])
    assert r.n_tie_x == 3 and r.tau_b_r9 is None


def test_negative_sample_contract(spark):
    rows = [(i, f"s{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = negative_sample_k(df, 3, pool=32).collect()
    src = dict(rows)
    pool_ids = {
        r.neg_id for r in out
    }
    assert len(pool_ids) <= 32  # negatives only ever come from the pool
    by_anchor: dict[int, list] = {}
    for r in out:
        assert r.neg_id != r.doc_id
        assert src[r.neg_id] != src[r.doc_id]  # cross-group only
        by_anchor.setdefault(r.doc_id, []).append(r.neg_rank)
    for ranks in by_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # deterministic: a second run is row-identical
    again = negative_sample_k(df, 3, pool=32).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_snm_matches_brute_force_replay(spark):
    """sorted_neighborhood_pairs == a Python replay: rank by
    (sort_key, id), pair each row with its window-1 successors,
    exact-jaccard verify — and every emitted pair also appears in
    the all-pairs exact result with the identical jaccard."""
    from hbase_gis_spark.operators.dedup import (
        jaccard_pairs,
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon", 30),
        (2, "alpha beta gamma delta zeta", 28),      # near-dup of 1
        (3, "one two three four five six", 27),
        (4, "alpha beta gamma delta epsilon", 30),   # exact dup of 1
        (5, "totally different words here now", 31),
        (6, "one two three four five seven", 29),    # near-dup of 3
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, n_chars int")
    W = 4
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in sorted_neighborhood_pairs(
            df, sort_col="n_chars", window=W, threshold=0.5
        ).collect()
    )
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(df, threshold=0.5).collect()
    }

    def shingles(t, n=3):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    order = sorted(rows, key=lambda r: (r[2], r[0]))
    expect = []
    for i, a in enumerate(order):
        for b in order[i + 1 : i + W]:
            sa, sb = shingles(a[1]), shingles(b[1])
            u = len(sa | sb)
            j = len(sa & sb) / u if u else 0.0
            if j >= 0.5:
                lo, hi = sorted((a[0], b[0]))
                expect.append((lo, hi, j))
    assert got == sorted(expect) and len(got) > 0
    for ia, ib, j in got:
        assert exact[(ia, ib)] == j  # verify stage IS the exact one


def test_snm_candidate_bound_is_skew_proof(spark):
    """Identical sort keys (the degenerate hot key that forces caps in
    bucket-based blocking) still produce exactly N(w-1) - (w-1)w/2
    candidate pairs — all verified at jaccard 1.0 on identical text."""
    from hbase_gis_spark.operators.dedup import sorted_neighborhood_pairs

    import pytest

    n, w = 20, 5
    df = spark.createDataFrame(
        [(i, "same tokens every single time", 29) for i in range(n)],
        "doc_id bigint, text string, n_chars int",
    )
    # the rank module's tie-mass guard must FIRE here (all keys equal
    # — the degenerate case it exists for) without breaking the result
    with pytest.warns(RuntimeWarning, match="tie-mass skew"):
        out = sorted_neighborhood_pairs(
            df, sort_col="n_chars", window=w, threshold=0.9
        ).collect()
    assert len(out) == n * (w - 1) - (w - 1) * w // 2
    assert all(r.jaccard == 1.0 and r.id_a < r.id_b for r in out)
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, window=1)


def test_leakage_safe_split_closes_the_leak(spark):
    """A dup pair whose doc-keyed hashes land in DIFFERENT splits
    (found deterministically via the same md5 race) lands in ONE
    split under cluster-keyed assignment; every cluster maps to
    exactly one split; singletons keep split_assign's exact label."""
    from hbase_gis_spark.operators.dedup import (
        jaccard_pairs,
        leakage_safe_split,
        split_assign,
    )

    import hashlib

    def bucket(i, mod):
        h = hashlib.md5(f"split:{i}".encode()).hexdigest()
        return int(h[:15], 16) % mod

    # two ids that the 50/50 doc-keyed split separates
    a = 1
    b = next(i for i in range(2, 200) if bucket(i, 2) != bucket(a, 2))
    dup_text = "the exact same duplicated document text body here"
    rows = [
        (a, dup_text),
        (b, dup_text),
        (50_000, "a singleton document about something else entirely"),
        (50_001, "another unrelated singleton with its own words"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = jaccard_pairs(df, threshold=0.5)
    w = {"x": 1, "y": 1}

    naive = {
        r.doc_id: r.split
        for r in split_assign(df, weights=w).collect()
    }
    assert naive[a] != naive[b]  # the leak exists under doc-keyed hashing

    safe = {
        r.doc_id: (r.cluster_id, r.split)
        for r in leakage_safe_split(df, pairs, weights=w).collect()
    }
    assert safe[a] == safe[b] == (min(a, b), safe[a][1])  # leak closed
    # one split per cluster, and singleton labels match split_assign
    # applied to their own (cluster = self) id
    for i in (50_000, 50_001):
        assert safe[i][0] == i and safe[i][1] == naive[i]


def test_cuped_matches_closed_form_and_reduces_variance(spark):
    """cuped_adjusted_ab equals the numpy closed form (pooled theta
    from exact sums, population variances) and actually reduces
    variance on a covariate-correlated metric."""
    import random

    from hbase_gis_spark.operators.drift import cuped_adjusted_ab

    rng = random.Random(7)
    rows = []
    for i in range(400):
        x = rng.randint(0, 50)
        lift = 3 if i % 2 == 0 else 0
        y = 2 * x + rng.randint(-4, 4) + lift  # sticky unit metric
        rows.append(("a" if i % 2 == 0 else "b", y, x))
    df = spark.createDataFrame(rows, "arm string, y int, x int")
    got = {
        r.arm: r for r in cuped_adjusted_ab(df, "arm", "y", "x").collect()
    }

    n = float(len(rows))
    sx = float(sum(r[2] for r in rows))
    sy = float(sum(r[1] for r in rows))
    sxx = float(sum(r[2] * r[2] for r in rows))
    sxy = float(sum(r[2] * r[1] for r in rows))
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mu = sx / n
    for arm in ("a", "b"):
        sub = [r for r in rows if r[0] == arm]
        na = float(len(sub))
        say = float(sum(r[1] for r in sub))
        sax = float(sum(r[2] for r in sub))
        sayy = float(sum(r[1] * r[1] for r in sub))
        saxx = float(sum(r[2] * r[2] for r in sub))
        saxy = float(sum(r[2] * r[1] for r in sub))
        mean_y = say / na
        mean_c = (say - theta * (sax - na * mu)) / na
        var_y = sayy / na - (say / na) * (say / na)
        ey2c = (
            sayy
            - 2.0 * theta * (saxy - mu * say)
            + theta * theta * (saxx - 2.0 * mu * sax + na * mu * mu)
        ) / na
        var_c = ey2c - mean_c * mean_c
        r = got[arm]
        assert r.n_units == len(sub)
        assert r.theta_r9 == round(theta, 9)
        assert r.mean_y_r9 == round(mean_y, 9)
        assert r.mean_cuped_r9 == round(mean_c, 9)
        assert r.var_y_r9 == round(var_y, 9)
        assert r.var_cuped_r9 == round(var_c, 9)
        assert r.var_cuped_r9 < r.var_y_r9  # the point of CUPED
        assert r.var_ratio_r9 < 0.2  # strong covariate -> big win
    # the true lift (3) survives adjustment
    assert abs((got["a"].mean_cuped_r9 - got["b"].mean_cuped_r9) - 3) < 1.0


def test_cuped_constant_covariate_degrades_to_raw(spark):
    """var(X) = 0: theta is NULL and the adjusted columns equal the
    raw ones (theta treated as 0); NULL-measure units are dropped."""
    from hbase_gis_spark.operators.drift import cuped_adjusted_ab

    df = spark.createDataFrame(
        [("a", 10, 5), ("a", 12, 5), ("b", 20, 5), ("b", None, 5)],
        "arm string, y int, x int",
    )
    got = {
        r.arm: r for r in cuped_adjusted_ab(df, "arm", "y", "x").collect()
    }
    assert got["b"].n_units == 1  # NULL y dropped
    for r in got.values():
        assert r.theta_r9 is None
        assert r.mean_cuped_r9 == r.mean_y_r9
        assert r.var_cuped_r9 == r.var_y_r9


def test_negative_sample_null_group_gets_none(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "b")],
        "doc_id bigint, source string",
    )
    out = negative_sample_k(df, 2, pool=4).collect()
    anchors = {r.doc_id for r in out}
    assert 3 not in anchors  # NULL-group anchor: NULL != x never true
    # and NULL-group pool members never serve as negatives either
    assert all(r.neg_id != 3 for r in out)
