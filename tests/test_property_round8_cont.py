"""Property tests for the round-8-continued operators: random inputs
against independent (numpy / brute-force / full-recompute) models."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=40),
    cut=st.integers(min_value=0, max_value=40),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_incremental_rollup_equals_recompute_property(spark, n, cut, seed):
    """Any split point of any random table folds to the full
    recompute — additivity holds wherever the batch boundary lands
    (including empty-history and empty-batch edges)."""
    import random

    from hbase_gis_spark.operators.merge import incremental_rollup

    rng = random.Random(seed)
    rows = [
        (rng.choice(["a", "b", None]), rng.randint(0, 3),
         rng.choice([None, rng.randint(-50, 50)]))
        for _ in range(n)
    ]
    cut = min(cut, n)
    df = spark.createDataFrame(rows, "k string, d int, v int")
    hist = spark.createDataFrame(rows[:cut], "k string, d int, v int")
    batch = spark.createDataFrame(rows[cut:], "k string, d int, v int")

    def agg(x):
        return x.groupBy("k", "d").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("v").cast("bigint").alias("v"),
        )

    keyf = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    got = sorted(
        map(tuple, incremental_rollup(
            agg(hist), batch, ["k", "d"], count_col="n_rows",
            sum_cols=["v"],
        ).collect()),
        key=keyf,
    )
    assert got == sorted(map(tuple, agg(df).collect()), key=keyf)


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=8, max_value=25),
    window=st.integers(min_value=3, max_value=8),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_rolling_corr_matches_numpy_property(spark, n, window, seed):
    """rolling_corr agrees with numpy's Pearson on every full frame of
    a random integer series (to the stated 9-decimal rounding)."""
    import numpy as np

    from hbase_gis_spark.operators.timeseries import rolling_corr

    rng = np.random.default_rng(seed)
    xs = rng.integers(-1000, 1000, n)
    ys = rng.integers(-10**6, 10**6, n)
    days = spark.createDataFrame(
        [(i, int(xs[i]), int(ys[i])) for i in range(n)],
        "day bigint, x bigint, y bigint",
    )
    got = {
        r.day: r.corr_r9
        for r in rolling_corr(days, "x", "y", window=window).collect()
    }
    assert set(got) == set(range(window - 1, n))
    for d in got:
        fx = xs[d - window + 1 : d + 1].astype(float)
        fy = ys[d - window + 1 : d + 1].astype(float)
        if fx.std() == 0 or fy.std() == 0:
            assert got[d] is None
            continue
        expect = float(np.corrcoef(fx, fy)[0, 1])
        assert got[d] is not None and math.isclose(
            got[d], expect, abs_tol=5e-9
        ), (d, got[d], expect)


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=30),
    k=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_weighted_sample_matches_bruteforce_property(spark, n, k, seed):
    """The k winners equal the brute-force enumeration of every
    ticket's md5 — selection is a pure function of (ids, weights,
    salt, k), whatever the weights."""
    import hashlib
    import random

    from hbase_gis_spark.operators.corpus import weighted_sample_k

    rng = random.Random(seed)
    items = [(i, rng.randint(-2, 70)) for i in range(n)]
    df = spark.createDataFrame(items, "id bigint, w bigint")
    got = [
        (r.id, r.weight, r.sel_key)
        for r in weighted_sample_k(
            df, k, "w", id_col="id", salt=f"p{seed}", max_weight=64
        ).collect()
    ]
    brute = []
    for i, w in items:
        w = max(1, min(w, 64))
        key = min(
            hashlib.md5(f"p{seed}:{i}:{t}".encode()).hexdigest()
            for t in range(1, w + 1)
        )
        brute.append((i, w, key))
    brute.sort(key=lambda r: (r[2], r[0]))
    assert got == brute[:k]


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=12),
    dim=st.integers(min_value=2, max_value=6),
    k=st.integers(min_value=1, max_value=6),
    lam_ppm=st.sampled_from([0, 300_000, 700_000, 1_000_000]),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_mmr_rerank_matches_bruteforce_property(
    spark, n, dim, k, lam_ppm, seed
):
    """mmr_rerank's selection equals an independent brute-force MMR
    greedy (sequential-fold sims, score-desc/id-asc ties) for random
    vector sets, any λ, any k."""
    import numpy as np

    from hbase_gis_spark.operators.retrieval import mmr_rerank

    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n + 1, dim))
    rows = [(i, [float(x) for x in V[i]]) for i in range(n + 1)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = [
        r.vec_id for r in mmr_rerank(
            df, 0, k, fetch_k=50, lam_ppm=lam_ppm
        ).collect()
    ]

    # brute force on the same float32-cast vectors
    W = V.astype(np.float32).astype(np.float64)

    def seq_dot(a, b):
        acc = 0.0
        for j in range(len(a)):
            acc += a[j] * b[j]
        return acc

    def cos(a, b):
        return seq_dot(a, b) / (
            np.sqrt(seq_dot(a, a)) * np.sqrt(seq_dot(b, b))
        )

    lam = lam_ppm / 1_000_000.0
    cands = sorted(
        range(1, n + 1), key=lambda i: (-cos(W[i], W[0]), i)
    )
    picked = [cands[0]]
    rest = set(cands[1:])
    while rest and len(picked) < k:
        best, bs = None, None
        for c in sorted(rest):
            ms = max(cos(W[c], W[s]) for s in picked)
            score = lam * cos(W[c], W[0]) - (1.0 - lam) * ms
            if bs is None or score > bs:
                best, bs = c, score
        picked.append(best)
        rest.discard(best)
    assert got == picked, (got, picked)


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=25),
    k=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_weighted_sample_per_group_restricts_global_race(
    spark, n, k, seed
):
    """A group's winners are exactly the global ticket race restricted
    to that group — same salt, same keys (incl. a NULL group), ranks
    dense 1..min(k, |group|)."""
    import random

    from hbase_gis_spark.operators.corpus import (
        weighted_sample_k,
        weighted_sample_k_per_group,
    )

    rng = random.Random(seed)
    rows = [
        (rng.choice(["g1", "g2", None]), i, rng.randint(1, 9))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "g string, id bigint, w int")
    per = weighted_sample_k_per_group(
        df, k, "w", "g", id_col="id", salt=f"s{seed}"
    ).collect()
    # global order restricted per group == per-group output
    full = weighted_sample_k(
        df, n, "w", id_col="id", salt=f"s{seed}"
    ).collect()
    key_of = {r.id: r.sel_key for r in full}
    by_group = {}
    for g, i, w in rows:
        by_group.setdefault(g, []).append(i)
    for g, ids in by_group.items():
        expect = sorted(ids, key=lambda i: (key_of[i], i))[:k]
        got = sorted(
            [r for r in per if r.g == g], key=lambda r: r.rnk
        )
        assert [r.id for r in got] == expect, (g, seed)
        assert [r.rnk for r in got] == list(range(1, len(expect) + 1))
        for r in got:
            assert r.sel_key == key_of[r.id]
