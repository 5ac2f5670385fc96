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


def test_bloom_filter_audit_exact_replay(spark):
    """Exact Python replay of the md5-ticket bit set and probe FPR on
    a small key set / small m (forcing real collisions)."""
    import hashlib

    from hbase_gis_spark.operators.drift import bloom_filter_audit

    M, K, NP = 64, 2, 50
    rows = [(i,) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint")

    def bit(prefix, i):
        h = hashlib.md5(f"bloom:{i}:{prefix}".encode()).hexdigest()[:15]
        return int(h, 16) % M

    bits = {bit(str(i), h) for (i,) in rows for h in range(K)}
    fps = sum(
        1
        for p in range(NP)
        if all(bit(f"__probe__{p}", h) in bits for h in range(K))
    )
    got = bloom_filter_audit(
        df, "doc_id", m_bits=M, k_hashes=K, n_probes=NP
    ).collect()[0]
    assert (
        got.m_bits, got.k_hashes, got.n_keys, got.n_bits_set,
        got.fill_milli, got.n_probes, got.n_false_pos, got.fpr_milli,
    ) == (M, K, 30, len(bits), 1000 * len(bits) // M, NP, fps,
          1000 * fps // NP)
    assert got.n_false_pos > 0  # small m forces real collisions


def test_bloom_filter_audit_rejects_bad_shapes(spark):
    from hbase_gis_spark.operators.drift import bloom_filter_audit

    df = spark.createDataFrame([(1,)], "doc_id bigint")
    with pytest.raises(ValueError, match="m_bits"):
        bloom_filter_audit(df, "doc_id", m_bits=0)


def test_conformal_coverage_exact_replay(spark):
    """Known scores: the threshold is the exact
    ceil((1-alpha)(n+1))-th smallest calibration score and the
    coverage count replays, including tied score values."""
    import hashlib

    from hbase_gis_spark.operators.drift import conformal_coverage

    rows = [(i, (i * 13) % 40) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id bigint, score bigint")

    def is_cal(i):
        h = hashlib.md5(f"conf:{i}".encode()).hexdigest()[:15]
        return int(h, 16) % 2 == 0

    cal = sorted(s for i, s in rows if is_cal(i))
    test = [s for i, s in rows if not is_cal(i)]
    n = len(cal)
    q_index = ((n + 1) * 900 + 999) // 1000
    thr = cal[q_index - 1]
    covered = sum(1 for s in test if s <= thr)
    got = conformal_coverage(df, "score", "doc_id", alpha_milli=100
                             ).collect()[0]
    assert (got.n_cal, got.q_index, got.threshold, got.n_test,
            got.n_covered, got.coverage_milli) == (
        n, q_index, thr, len(test), covered,
        1000 * covered // len(test))


def test_conformal_coverage_rejects_bad_alpha(spark):
    from hbase_gis_spark.operators.drift import conformal_coverage

    df = spark.createDataFrame([(1, 1)], "doc_id bigint, score bigint")
    with pytest.raises(ValueError, match="alpha_milli"):
        conformal_coverage(df, "score", alpha_milli=0)


def test_calibration_bins_exact_replay(spark):
    """Hand-built predictions: per-bin integers replay, the top edge
    (pred exactly 1000) folds into the last bin, and NULLs drop."""
    from hbase_gis_spark.operators.drift import calibration_bins

    rows = [
        (0, 0), (50, 0), (99, 1),          # bin 0
        (100, 1), (199, 1),                # bin 1
        (950, 1), (1000, 1), (999, 0),     # bin 9 (incl. folded 1000)
        (None, 1), (500, None),            # dropped
    ]
    df = spark.createDataFrame(rows, "pred_milli bigint, y bigint")
    got = {
        r.bin: (r.bin_lo_milli, r.bin_hi_milli, r.n_docs, r.n_pos,
                r.mean_pred_milli, r.pos_rate_milli, r.gap_milli)
        for r in calibration_bins(df, "pred_milli", "y").collect()
    }
    assert got[0] == (0, 100, 3, 1, 149 // 3, 1000 // 3,
                      abs(149 // 3 - 1000 // 3))
    assert got[1] == (100, 200, 2, 2, 299 // 2, 1000, 1000 - 299 // 2)
    assert got[9] == (900, 1000, 3, 2, 2949 // 3, 2000 // 3,
                      abs(2949 // 3 - 2000 // 3))
    assert set(got) == {0, 1, 9}


def test_calibration_bins_rejects_bad_nbins(spark):
    from hbase_gis_spark.operators.drift import calibration_bins

    df = spark.createDataFrame([(1, 1)], "pred_milli bigint, y bigint")
    with pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, "pred_milli", "y", n_bins=7)


def _norm_knn(vecs, qid, k):
    """Exact cosine top-k neighbor ids for query qid (ties by id)."""
    import math

    q = vecs[qid]
    qn = math.sqrt(sum(x * x for x in q))

    def cos(v):
        return sum(a * b for a, b in zip(q, v)) / (
            qn * math.sqrt(sum(x * x for x in v))
        )

    order = sorted(
        ((i, cos(v)) for i, v in vecs.items() if i != qid),
        key=lambda t: (-t[1], t[0]),
    )
    return [i for i, _ in order[:k]]


def test_embedding_diversity_moment_identity(spark):
    """Hand vectors: the reported moments equal the brute-force
    ordered-pair dot sum over the int8-quantized vectors, and a
    collapsed label (identical vectors) hits the self-dot ceiling."""
    from hbase_gis_spark.operators.similarity import embedding_diversity

    rows = [
        (1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0), (3, [-1.0, 0.0], 0),
        (4, [0.5, 0.5], 1), (5, [0.5, 0.5], 1),   # collapsed pair
        (6, [2.0, -1.0], 2),                       # singleton
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = {
        r.label: (r.n_vecs, r.self_dot_sum, r.cross_dot_sum,
                  r.mean_pair_dot_milli)
        for r in embedding_diversity(df).collect()
    }

    def quant(v):
        s = max(abs(x) for x in v) / 127.0
        return [round(x / s) if s > 0 else 0 for x in v]

    by_label = {}
    for _, v, l in rows:
        by_label.setdefault(l, []).append(quant(v))
    for l, qs in by_label.items():
        self_d = sum(sum(x * x for x in q) for q in qs)
        cross = sum(
            sum(a * b for a, b in zip(qa, qb))
            for i, qa in enumerate(qs)
            for j, qb in enumerate(qs)
            if i != j
        )
        n = len(qs)
        # engine div TRUNCATES toward zero (Spark div == DuckDB //),
        # unlike Python's floor //
        mean = (
            int(1000 * cross / (n * (n - 1))) if n > 1 else None
        )
        assert got[l] == (n, self_d, cross, mean), l
    # collapsed label 1: mean pair dot == per-vector self dot (127^2*2)
    assert got[1][3] == 1000 * (127 * 127 * 2) * 2 // 2
    assert got[2][3] is None  # singleton has no pairs


def test_label_knn_agreement_exact_replay(spark):
    """Deterministic 2-D vectors: agreement counts equal the
    brute-force top-k label match replay."""
    from hbase_gis_spark.operators.similarity import label_knn_agreement

    vecs = {
        i: [float((i * 7) % 13 - 6), float((i * 11) % 17 - 8) or 1.0]
        for i in range(20)
    }
    labels = {i: i % 3 for i in range(20)}
    rows = [(i, vecs[i], labels[i]) for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    qids, k = [0, 1, 2], 5
    got = {
        r.label: (r.n_queries, r.n_neighbors, r.n_same_label,
                  r.agree_milli)
        for r in label_knn_agreement(df, qids, k).collect()
    }
    expect = {}
    for qid in qids:
        nb = _norm_knn(vecs, qid, k)
        l = labels[qid]
        nq, nn, ns = expect.get(l, (0, 0, 0))
        expect[l] = (nq + 1, nn + len(nb),
                     ns + sum(1 for i in nb if labels[i] == l))
    expect = {
        l: (nq, nn, ns, 1000 * ns // nn)
        for l, (nq, nn, ns) in expect.items()
    }
    assert got == expect


def test_retrieval_map_exact_ap(spark):
    """Hand-built geometry with a KNOWN ranking: AP integers replay
    the textbook average-precision formula, and k > 10 is rejected."""
    import pytest as _pytest

    from hbase_gis_spark.operators.similarity import retrieval_map_report

    # query 0 at [1, 0]; neighbors ranked by cosine: ids 1..6 in order
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.1], 0),    # rank 1, relevant
        (2, [1.0, 0.2], 1),    # rank 2
        (3, [1.0, 0.3], 0),    # rank 3, relevant
        (4, [1.0, 0.4], 1),    # rank 4
        (5, [1.0, 0.5], 0),    # rank 5, relevant
        (6, [1.0, 0.6], 1),    # rank 6
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = retrieval_map_report(df, [0], 4).collect()[0]
    # top-4 = ids 1,2,3,4; hits at ranks 1 and 3
    sum_prec = (2520 * 1) // 1 + (2520 * 2) // 3
    n_rel_total = 3  # ids 1,3,5 share label 0
    assert (got.query_id, got.label, got.n_rel_topk, got.n_rel_total,
            got.sum_prec_x2520) == (0, 0, 2, 3, sum_prec)
    assert got.ap_micro == (1000000 * sum_prec) // (2520 * 3)
    with _pytest.raises(ValueError, match="x2520"):
        retrieval_map_report(df, [0], 11)


def test_confusion_report_exact_replay(spark):
    """Hand-built predictions: cells, marginals (including a class
    never predicted and a class never true), and the integer PRF
    identities replay; NULLs drop."""
    from hbase_gis_spark.operators.drift import confusion_report

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),     # a predicted 3x
        ("b", "b"), ("b", "a"),                 # b predicted 2x
        ("c", "a"),                             # c never true
        (None, "a"), ("a", None),               # dropped
    ]
    df = spark.createDataFrame(rows, "pred string, truth string")
    got = {
        r.label: (r.n_true, r.n_pred, r.tp, r.fp, r.fn,
                  r.precision_milli, r.recall_milli, r.f1_milli)
        for r in confusion_report(df, "pred", "truth").collect()
    }
    # truth counts: a=4 (aa, aa, ba, ca), b=2 (ab, bb)
    assert got["a"] == (4, 3, 2, 1, 2, 2000 // 3, 500, 4000 // 7)
    assert got["b"] == (2, 2, 1, 1, 1, 500, 500, 500)
    assert got["c"] == (0, 1, 0, 1, 0, 0, None, 0)
    assert set(got) == {"a", "b", "c"}


def test_cohens_kappa_exact_and_edges(spark):
    """Textbook kappa replays exactly; perfect agreement gives
    1000000; a single shared category (pe = 1) gives NULL."""
    from hbase_gis_spark.operators.drift import cohens_kappa

    # classic 2x2: a: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = cohens_kappa(df, "a", "b").collect()[0]
    n, agree = 50, 35
    s = 25 * 30 + 25 * 20  # na(y)*nb(y) + na(n)*nb(n)
    num, den = n * agree - s, n * n - s
    assert (got.n_items, got.n_agree, got.agree_milli,
            got.kappa_micro) == (n, agree, 1000 * agree // n,
                                 1000000 * num // den)

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
    )
    assert cohens_kappa(perfect, "a", "b").collect()[0].kappa_micro \
        == 1000000

    degenerate = spark.createDataFrame(
        [("x", "x"), ("x", "x")], "a string, b string"
    )
    assert cohens_kappa(degenerate, "a", "b").collect()[0].kappa_micro \
        is None


def test_ndcg_report_exact_gains(spark):
    """Known ranking (the retrieval_map geometry): dcg_nano is the
    sum of the nano gains at the hit ranks, idcg_nano the ideal
    prefix at min(R, k), and k > 10 is rejected."""
    import pytest as _pytest

    from hbase_gis_spark.operators.similarity import (
        NDCG_GAIN_NANO,
        NDCG_IDEAL_NANO,
        ndcg_report,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.1], 0),    # rank 1, relevant
        (2, [1.0, 0.2], 1),    # rank 2
        (3, [1.0, 0.3], 0),    # rank 3, relevant
        (4, [1.0, 0.4], 1),    # rank 4
        (5, [1.0, 0.5], 0),    # rank 5, relevant
        (6, [1.0, 0.6], 1),    # rank 6
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = ndcg_report(df, [0], 4).collect()[0]
    dcg = NDCG_GAIN_NANO[0] + NDCG_GAIN_NANO[2]  # hits at ranks 1, 3
    idcg = NDCG_IDEAL_NANO[2]  # min(R=3, k=4) = 3
    assert (got.query_id, got.label, got.n_rel_topk, got.n_rel_total,
            got.dcg_nano, got.idcg_nano, got.ndcg_micro) == (
        0, 0, 2, 3, dcg, idcg, 1000000 * dcg // idcg)
    with _pytest.raises(ValueError, match="NDCG_GAIN_NANO"):
        ndcg_report(df, [0], 11)
