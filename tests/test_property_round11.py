"""Property tests for the round-11 operators: random inputs against
independent brute-force Python models (no Spark-side shortcuts, no
SQL). Engine integer division is replayed as TRUNCATION toward zero
(Spark div == DuckDB //), not Python's floor."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from hbase_gis_spark.operators.corpus import curriculum_order, shard_balance
from hbase_gis_spark.operators.drift import (
    calibration_bins,
    conformal_coverage,
)
from hbase_gis_spark.operators.textstats import padding_waste


def _tdiv(a: int, b: int) -> int:
    """Engine integral division: truncation toward zero."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "dd"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=40,
    ),
    n_shards=st.integers(min_value=1, max_value=6),
)
def test_curriculum_order_property(spark, rows, n_shards):
    """For ANY difficulty distribution (duplicates, negatives, skewed
    groups) and ANY shard count, the operator equals the brute-force
    (within_rank, group) interleave — global_pos is a permutation of
    1..n and within_rank restarts per group."""
    data = [(i + 1, g, d) for i, (g, d) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id bigint, source string, difficulty bigint"
    )
    got = sorted(
        tuple(r)
        for r in curriculum_order(
            df, "difficulty", "source", "doc_id", n_shards=n_shards
        ).collect()
    )
    ranked = []
    by_g: dict = {}
    for i, g, d in data:
        by_g.setdefault(g, []).append((d, i))
    for g, lst in by_g.items():
        for r, (_, i) in enumerate(sorted(lst), start=1):
            ranked.append((i, g, r))
    order = sorted(ranked, key=lambda t: (t[2], t[1]))
    expect = sorted(
        (i, g, r, pos) for pos, (i, g, r) in enumerate(order, start=1)
    )
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    n=st.integers(min_value=1, max_value=8),
)
def test_shard_balance_property(spark, rows, n):
    """For ANY id/weight set and shard count, counts, weight mass,
    and the milli-of-even ratios replay the md5 assignment exactly."""
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = sorted(
        tuple(r)
        for r in shard_balance(
            df, n, id_col="doc_id", weight_col="w", salt="p"
        ).collect()
    )
    per: dict = {}
    for i, w in rows:
        h = int(hashlib.md5(f"p:{i}".encode()).hexdigest()[:15], 16) % n
        c, m = per.get(h, (0, 0))
        per[h] = (c + 1, m + w)
    rt = sum(c for c, _ in per.values())
    wt = sum(m for _, m in per.values())
    expect = sorted(
        (
            s, c, m, _tdiv(1000 * c * n, rt),
            _tdiv(1000 * m * n, wt) if wt else None,  # nullif(wt, 0)
        )
        for s, (c, m) in per.items()
    )
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    lens=st.lists(
        st.integers(min_value=0, max_value=80), min_size=1, max_size=30
    ),
    caps=st.sets(
        st.integers(min_value=1, max_value=64), min_size=1, max_size=4
    ),
)
def test_padding_waste_property(spark, lens, caps):
    """For ANY document lengths and ANY cap grid, per-bucket counts,
    token sums, and waste replay the smallest-fitting-cap model
    (length-0 docs still tokenize to one empty token — the stated
    whitespace-split convention)."""
    rows = [(i, " ".join(["w"] * L)) for i, L in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.bucket_cap: (r.n_docs, r.actual_tokens, r.padded_tokens,
                       r.pad_waste, r.waste_milli)
        for r in padding_waste(df, bucket_caps=tuple(caps)).collect()
    }
    grid = sorted(caps)
    per: dict = {}
    for L in lens:
        ntok = max(L, 1)  # split("", \s+) == [""] -> one token
        cap = next((c for c in grid if ntok <= c), None)
        c, s = per.get(cap, (0, 0))
        per[cap] = (c + 1, s + ntok)
    expect = {}
    for cap, (c, s) in per.items():
        padded = cap * c if cap is not None else s
        waste = padded - s
        expect[cap] = (
            c, s, padded, waste,
            _tdiv(1000 * waste, padded) if padded > 0 else 0,
        )
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    scores=st.lists(
        st.integers(min_value=-20, max_value=20),
        min_size=4,
        max_size=60,
    ),
    alpha=st.integers(min_value=50, max_value=500),
)
def test_conformal_coverage_property(spark, scores, alpha):
    """For ANY score multiset (ties, negatives) and alpha level, the
    threshold is the exact order statistic of the hash-elected
    calibration half and the held-out coverage count replays."""
    rows = [(i + 1, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "doc_id bigint, score bigint")
    got = conformal_coverage(
        df, "score", "doc_id", alpha_milli=alpha
    ).collect()[0]

    def is_cal(i):
        h = hashlib.md5(f"conf:{i}".encode()).hexdigest()[:15]
        return int(h, 16) % 2 == 0

    cal = sorted(s for i, s in rows if is_cal(i))
    test = [s for i, s in rows if not is_cal(i)]
    n = len(cal)
    q_index = ((n + 1) * (1000 - alpha) + 999) // 1000
    assert (got.n_cal, got.q_index, got.n_test) == (
        n, q_index, len(test))
    if n == 0 or q_index > n:
        assert got.threshold is None
        return
    thr = cal[q_index - 1]
    covered = sum(1 for s in test if s <= thr)
    assert (got.threshold, got.n_covered) == (thr, covered)
    if test:
        assert got.coverage_milli == 1000 * covered // len(test)


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(
                st.none(), st.integers(min_value=0, max_value=1000)
            ),
            st.one_of(st.none(), st.integers(min_value=0, max_value=1)),
        ),
        min_size=1,
        max_size=50,
    ),
    n_bins=st.sampled_from([1, 2, 4, 5, 8, 10, 20]),
)
def test_calibration_bins_property(spark, rows, n_bins):
    """For ANY milli predictions (incl. the 1000 top edge and NULLs)
    and any 1000-dividing bin count, per-bin integers replay."""
    df = spark.createDataFrame(rows, "pred_milli bigint, y bigint")
    got = {
        r.bin: (r.bin_lo_milli, r.bin_hi_milli, r.n_docs, r.n_pos,
                r.mean_pred_milli, r.pos_rate_milli, r.gap_milli)
        for r in calibration_bins(
            df, "pred_milli", "y", n_bins=n_bins
        ).collect()
    }
    width = 1000 // n_bins
    per: dict = {}
    for p, y in rows:
        if p is None or y is None:
            continue
        b = min(p // width, n_bins - 1)
        c, pos, sp = per.get(b, (0, 0, 0))
        per[b] = (c + 1, pos + y, sp + p)
    expect = {}
    for b, (c, pos, sp) in per.items():
        mp, pr = sp // c, 1000 * pos // c
        expect[b] = (b * width, (b + 1) * width, c, pos, mp, pr,
                     abs(mp - pr))
    assert got == expect
