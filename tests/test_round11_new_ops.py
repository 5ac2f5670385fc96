"""Round-11 additions, batch 1: curriculum interleave ordering,
hash-shard balance audit, length-bucket padding waste. Each test is
an exact Python replay of the operator's stated semantics on a
hand-built frame (the pytest leg; the DuckDB oracle leg lives in
__spark_entry__.oracle_sql)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _curriculum_expect(rows):
    """(id, group, difficulty) -> exact (id, group, within_rank,
    global_pos) replay of the round-robin interleave."""
    ranked = []
    by_g = {}
    for i, g, d in rows:
        by_g.setdefault(g, []).append((d, i))
    for g, lst in by_g.items():
        for r, (_, i) in enumerate(sorted(lst), start=1):
            ranked.append((i, g, r))
    order = sorted(ranked, key=lambda t: (t[2], t[1]))
    return sorted(
        (i, g, r, pos)
        for pos, (i, g, r) in enumerate(order, start=1)
    )


def test_curriculum_order_exact_interleave(spark):
    """Uneven source sizes + duplicate difficulty values: the output
    equals the brute-force (within_rank, source) interleave, and the
    first |sources| positions are every source's easiest doc."""
    from hbase_gis_spark.operators.corpus import curriculum_order

    rows = [
        (1, "a", 30), (2, "a", 10), (3, "a", 20), (4, "a", 10),
        (5, "b", 5), (6, "b", 50),
        (7, "c", 7), (8, "c", 7), (9, "c", 7), (10, "c", 1), (11, "c", 99),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, difficulty bigint"
    )
    got = sorted(
        tuple(r)
        for r in curriculum_order(
            df, "difficulty", "source", "doc_id", n_shards=3
        ).collect()
    )
    assert got == _curriculum_expect(rows)
    first_round = sorted(
        (g, i) for i, g, r, p in got if p <= 3
    )
    assert first_round == [("a", 2), ("b", 5), ("c", 10)]


def test_curriculum_order_single_source_and_one_shard(spark):
    """Degenerate shapes: one source == a plain difficulty sort;
    n_shards=1 (no boundaries) still exact."""
    from hbase_gis_spark.operators.corpus import curriculum_order

    rows = [(i, "only", (i * 7) % 5) for i in range(1, 11)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, difficulty bigint"
    )
    got = sorted(
        tuple(r)
        for r in curriculum_order(
            df, "difficulty", "source", "doc_id", n_shards=1
        ).collect()
    )
    assert got == _curriculum_expect(rows)
    # one source: global_pos == within_rank everywhere
    assert all(r == p for _, _, r, p in got)


def test_shard_balance_exact_counts_and_milli(spark):
    """The audit reproduces a Python replay of md5(salt:id) % n over
    both row counts and weight mass, including the div-truncated
    milli-of-even ratios."""
    import hashlib

    from hbase_gis_spark.operators.corpus import shard_balance

    n = 4
    rows = [(i, 10 + i) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = sorted(
        tuple(r)
        for r in shard_balance(
            df, n, id_col="doc_id", weight_col="w", salt="s"
        ).collect()
    )
    per = {}
    for i, w in rows:
        h = int(hashlib.md5(f"s:{i}".encode()).hexdigest()[:15], 16) % n
        c, m = per.get(h, (0, 0))
        per[h] = (c + 1, m + w)
    rt = sum(c for c, _ in per.values())
    wt = sum(m for _, m in per.values())
    expect = sorted(
        (s, c, m, 1000 * c * n // rt, 1000 * m * n // wt)
        for s, (c, m) in per.items()
    )
    assert got == expect


def test_shard_balance_rejects_bad_shapes(spark):
    from hbase_gis_spark.operators.corpus import shard_balance

    df = spark.createDataFrame([(1, 2)], "doc_id bigint, w bigint")
    with pytest.raises(ValueError, match="n_shards"):
        shard_balance(df, 0)


def test_padding_waste_exact_buckets(spark):
    """Boundary lengths (exactly 16, 17, exactly 512) land in the
    right bucket; the overflow row pads nothing; integers replay."""
    from hbase_gis_spark.operators.textstats import padding_waste

    def doc(n):
        return " ".join(["w"] * n)

    rows = [
        (1, doc(16)), (2, doc(3)), (3, doc(17)), (4, doc(32)),
        (5, doc(512)), (6, doc(513)), (7, doc(600)),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.bucket_cap: (
            r.n_docs, r.actual_tokens, r.padded_tokens,
            r.pad_waste, r.waste_milli,
        )
        for r in padding_waste(df).collect()
    }
    # cap 16: lengths 16 and 3 -> padded 32, actual 19
    assert got[16] == (2, 19, 32, 13, 1000 * 13 // 32)
    # cap 32: lengths 17 and 32 -> padded 64, actual 49
    assert got[32] == (2, 49, 64, 15, 1000 * 15 // 64)
    # cap 512: exactly 512 -> zero waste
    assert got[512] == (1, 512, 512, 0, 0)
    # overflow (None): 513 + 600 batch alone, no padding
    assert got[None] == (2, 1113, 1113, 0, 0)
    assert set(got) == {16, 32, 512, None}


def test_padding_waste_rejects_bad_caps(spark):
    from hbase_gis_spark.operators.textstats import padding_waste

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="bucket_caps"):
        padding_waste(df, bucket_caps=(0, 16))
