"""Data-quality audit family (operators/quality.py): edge cases the
sf0.01 oracle parity can't see — NULL FK handling, min_cents
filtering, planted-leak accounting."""

import pytest
from pyspark.sql import functions as F

from hbase_gis_spark.operators.quality import (
    benford_first_digit,
    cross_split_leakage,
    fd_audit,
    referential_orphans,
    uniqueness_audit,
)


def test_orphans_separate_null_keys_from_dangling(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (None,), (99,), (None,)], "fk bigint"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    row = referential_orphans([("r", fact, "fk", dim, "pk")]).head()
    assert (row.n_rows, row.n_null_keys, row.n_orphans) == (5, 2, 1)


def test_orphans_dim_duplicates_do_not_inflate(spark):
    # a duplicated dim key must not multiply fact rows (anti join +
    # the explicit distinct guard)
    fact = spark.createDataFrame([(1,), (7,)], "fk bigint")
    dim = spark.createDataFrame([(1,), (1,), (1,)], "pk bigint")
    row = referential_orphans([("r", fact, "fk", dim, "pk")]).head()
    assert (row.n_rows, row.n_orphans) == (2, 1)


def test_uniqueness_audit_counts_null_group(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (3, None), (4, "b")],
        "k bigint, v string",
    )
    got = {r.column: r for r in uniqueness_audit(df, ["k", "v"]).collect()}
    assert got["k"].n_rows == 5 and got["k"].n_distinct == 4
    assert got["k"].n_dup_keys == 1 and got["k"].max_dup == 2
    # NULLs group as one value: v has a, b, NULL -> 3 distinct
    assert got["v"].n_distinct == 3 and got["v"].max_dup == 2


def test_benford_min_cents_and_digit_extraction(spark):
    df = spark.createDataFrame(
        [(99,), (100,), (1999,), (950,), (90000,)], "cents bigint"
    )
    rows = {r.digit: r for r in benford_first_digit(df, "cents").collect()}
    assert len(rows) == 9  # dense 1..9 spine
    # 99 excluded (< min_cents); digits: 1 (100), 1 (1999), 9 (950, 90000)
    assert rows[1].n == 2 and rows[9].n == 2
    assert sum(r.n for r in rows.values()) == 4
    assert rows[1].observed_ppm == 500_000
    assert rows[1].expected_ppm == 301_030  # round(1e6*log10(2))


def test_cross_split_leakage_finds_planted_pairs(spark):
    # 20 unique docs + full copies of 5 of them under new ids: the
    # only cross-split fingerprint collisions are the planted ones
    base = [(i, f"unique text number {i}") for i in range(20)]
    planted = [(100 + i, f"unique text number {i}") for i in range(5)]
    df = spark.createDataFrame(base + planted, "doc_id bigint, text string")
    eq = {"train": 1, "val": 1, "test": 1}
    out = cross_split_leakage(df, weights=eq).collect()
    from hbase_gis_spark.operators.dedup import split_assign

    splits = {
        r.doc_id: r.split for r in split_assign(df, weights=eq).collect()
    }
    expect_pairs = sum(
        1 for i in range(5) if splits[i] != splits[100 + i]
    )
    assert sum(r.n_shared_fps for r in out) == expect_pairs
    for r in out:
        assert r.split_a < r.split_b


def test_fd_audit_violation_accounting(spark):
    # k=1 maps to one v (holds), k=2 maps to two vs across 3 rows
    # (violates), k=3 maps to one v twice (holds)
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (2, "b"), (2, "a"), (3, "c"), (3, "c")],
        "k bigint, v string",
    )
    row = fd_audit([("d", df, "k", "v")]).head()
    assert row.dependency == "d"
    assert (row.n_lhs, row.n_violating_lhs) == (3, 1)
    assert (row.max_variants, row.n_rows_in_violation) == (2, 3)


def test_fd_audit_null_rhs_is_not_a_variant(spark):
    # NULL rhs is ignored by the distinct count in BOTH engines: an
    # all-NULL group counts 0 variants, a {NULL, 'a'} group counts 1
    # — neither is a violation; NULL lhs groups as one ordinary value
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, None), (2, "a"), (None, "x"),
         (None, "y")],
        "k bigint, v string",
    )
    row = fd_audit([("d", df, "k", "v")]).head()
    assert row.n_lhs == 3
    assert row.n_violating_lhs == 1  # only the NULL-lhs {x, y} group
    assert row.n_rows_in_violation == 2


def test_fd_audit_holds_everywhere_reports_zero(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b")], "k bigint, v string"
    )
    row = fd_audit([("d", df, "k", "v")]).head()
    assert (row.n_violating_lhs, row.n_rows_in_violation) == (0, 0)
    assert row.max_variants == 1


@pytest.mark.parametrize("digit", [1])
def test_benford_expected_is_driver_literal(spark, digit):
    """expected_ppm never depends on data — a 1-row frame still gets
    the full 9-digit spine with the Python-math literals."""
    df = spark.createDataFrame([(12345,)], "cents bigint")
    rows = benford_first_digit(df, "cents").collect()
    import math

    for r in rows:
        assert r.expected_ppm == int(
            round(1_000_000 * math.log10(1 + 1 / r.digit))
        )


def test_split_balance_accounts_every_doc(spark):
    from hbase_gis_spark.operators.quality import split_balance

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(40)],
        "doc_id bigint, lang string",
    )
    w = {"train": 2, "val": 1, "test": 1}
    rows = split_balance(df, "lang", weights=w).collect()
    assert sum(r.n for r in rows) == 40
    for r in rows:
        assert r.observed_ppm + r.n >= 0  # shares are non-negative ints
        assert r.delta_ppm == r.observed_ppm - r.expected_ppm
    # per-stratum shares must sum to ~1e6 (floor-division remainder)
    from collections import defaultdict

    per = defaultdict(int)
    for r in rows:
        per[r.stratum] += r.observed_ppm
    for s, tot in per.items():
        assert 1_000_000 - 3 <= tot <= 1_000_000


def test_behavior_entropy_buckets(spark):
    import math

    from hbase_gis_spark.operators.quality import behavior_entropy

    # key 1: single category -> 0 milli-nats, bucket 0
    # key 2: uniform over 4 -> ln(4) = 1.386 nats -> bucket 13
    rows = [(1, "a")] * 6 + [(2, c) for c in "abcd"]
    df = spark.createDataFrame(rows, "k bigint, c string")
    got = {
        r.entropy_bucket: r.n_users
        for r in behavior_entropy(df, "k", "c").collect()
    }
    ln4_milli = round(1000 * math.log(4.0))
    assert got == {0: 1, ln4_milli // 100: 1}
