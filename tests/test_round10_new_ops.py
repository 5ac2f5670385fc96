"""Round-10 additions and hardening: SNM native-type / multi-key
sorting (ADVICE r9 #2, VERDICT r9 #7), negative-sample pool options
(VERDICT r9 #6, ADVICE r9 #4), CUPED input contract (ADVICE r9 #3),
and the split-drift audit operator (VERDICT r9 #5)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _shingles(t, n=3):
    w = t.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_snm_string_sort_key_exact_order(spark):
    """A STRING proxy key sorts in exact native (byte-wise) order —
    including rows that share an 8-byte surrogate prefix and differ
    only beyond it, and rows where zero-padding order matters ("ab" <
    "b" as strings though 0x6162 > 0x62 as left-aligned numbers).
    Verified against a Python replay of the same SNM semantics."""
    from hbase_gis_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        # titles crafted so byte-prefix surrogates collide / invert:
        (1, "alpha beta gamma delta epsilon", "aaaaaaaa-suffix-1"),
        (2, "alpha beta gamma delta zeta", "aaaaaaaa-suffix-2"),
        (3, "one two three four five six", "b"),
        (4, "alpha beta gamma delta epsilon", "ab"),
        (5, "totally different words here now", "aaaaaaaa"),
        (6, "one two three four five seven", "ba"),
        (7, "alpha beta gamma delta epsilon eta", "AAAAAAAA-caps"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, title string")
    W = 3
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in sorted_neighborhood_pairs(
            df, sort_col="title", window=W, threshold=0.4
        ).collect()
    )
    order = sorted(rows, key=lambda r: (r[2], r[0]))
    expect = []
    for i, a in enumerate(order):
        for b in order[i + 1 : i + W]:
            sa, sb = _shingles(a[1]), _shingles(b[1])
            u = len(sa | sb)
            j = len(sa & sb) / u if u else 0.0
            if j >= 0.4:
                lo, hi = sorted((a[0], b[0]))
                expect.append((lo, hi, j))
    assert got == sorted(expect) and len(got) > 0


def test_snm_unsupported_sort_key_type_raises(spark):
    """An un-orderable proxy-key type fails LOUDLY up front instead of
    silently NULLing the order (the ADVICE r9 #2 failure mode)."""
    from hbase_gis_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e", ["x"])],
        "doc_id bigint, text string, tags array<string>",
    )
    with pytest.raises(TypeError, match="supported proxy-key types"):
        sorted_neighborhood_pairs(df, sort_col="tags").collect()


def test_snm_multi_key_union_recall(spark):
    """Multi-pass SNM (VERDICT r9 #7): a near-dup pair whose LENGTHS
    are many window positions apart (missed by the length key alone)
    but whose normalized titles are adjacent is caught by the two-key
    union; single-key results are each a subset of the union."""
    from hbase_gis_spark.operators.dedup import sorted_neighborhood_pairs

    # docs 1 and 2 are true near-dups (3-shingle Jaccard 0.6) but
    # their LENGTH proxy keys are far apart (a noisy raw-length
    # column, the realistic pre-normalization proxy), with 18 filler
    # docs occupying every slot between them — the pair sits > window
    # positions apart under the length order. Their titles, however,
    # are adjacent under the string order.
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "same-title-a", 10),
        (2, "alpha beta gamma delta epsilon eta", "same-title-b", 500),
    ]
    for i in range(3, 21):
        rows.append(
            (i, f"pad{i} word filler " + " ".join(f"w{i}x{j}" for j in range(4)),
             f"zz-title-{i:02d}", 20 + i * 20)
        )
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, title string, n_chars int"
    )
    W, TH = 4, 0.5

    def pairs(**kw):
        return {
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(
                df, window=W, threshold=TH, **kw
            ).collect()
        }

    by_len = pairs(sort_col="n_chars")
    by_title = pairs(sort_col="title")
    union = pairs(sort_cols=["n_chars", "title"])
    assert (1, 2) not in by_len  # the length key alone misses it
    assert (1, 2) in by_title  # the title key catches it
    assert (1, 2) in union
    assert by_len <= union and by_title <= union
    assert union == by_len | by_title  # union of windows, nothing more
