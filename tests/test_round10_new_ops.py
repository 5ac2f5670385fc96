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
    # the 18 zz-title-NN fillers share an 8-byte surrogate prefix, so
    # the title pass legitimately fires the tie-mass skew warning on
    # this degenerate 20-row fixture — capture it (VERDICT r10 #6:
    # working as designed; keep the suite warning-clean)
    with pytest.warns(RuntimeWarning, match="tie-mass skew"):
        by_title = pairs(sort_col="title")
    with pytest.warns(RuntimeWarning, match="tie-mass skew"):
        union = pairs(sort_cols=["n_chars", "title"])
    assert (1, 2) not in by_len  # the length key alone misses it
    assert (1, 2) in by_title  # the title key catches it
    assert (1, 2) in union
    assert by_len <= union and by_title <= union
    assert union == by_len | by_title  # union of windows, nothing more


def test_cuped_rejects_floating_metric(spark):
    """ADVICE r9 #3: a float/double metric column raises up front
    instead of being silently rounded to whole units by the
    DECIMAL(38,0) exact-moment cast."""
    from hbase_gis_spark.operators.drift import cuped_adjusted_ab

    df = spark.createDataFrame(
        [("a", 1.5, 2), ("b", 2.5, 3)],
        "arm string, y double, x int",
    )
    with pytest.raises(TypeError, match="Quantize explicitly"):
        cuped_adjusted_ab(df, "arm", "y", "x")
    with pytest.raises(TypeError, match="Quantize explicitly"):
        cuped_adjusted_ab(df, "arm", "x", "y")
    # integer-valued columns still work
    ok = cuped_adjusted_ab(
        df.select("arm", F.col("x").alias("y"), F.col("x").alias("x")),
        "arm", "y", "x",
    ).collect()
    assert len(ok) == 2


def test_negative_sample_null_group_pool_exclusion(spark):
    """ADVICE r9 #4: NULL-group rows can never serve as negatives
    (__ng != __g is NULL-falsy), so they must not consume pool slots.
    With 60 NULL-group rows and only 6 attributed ones, a pool of 6
    must still hold the 6 attributed candidates — every anchor gets
    its full other-group negative set."""
    from hbase_gis_spark.operators.corpus import negative_sample_k

    rows = [(i, None) for i in range(100, 160)] + [
        (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c"), (6, "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = negative_sample_k(df, k=10, pool=6).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.doc_id, set()).add(r.neg_id)
    # NULL-group ids never appear on either side
    assert all(a < 100 for a in by_anchor)
    assert all(n < 100 for negs in by_anchor.values() for n in negs)
    # the pool was NOT diluted: each attributed anchor sees ALL 4
    # other-group members as negatives
    src = dict(rows)
    for a, negs in by_anchor.items():
        expect = {i for i, s in rows if s is not None and s != src[a]}
        assert negs == expect


def test_negative_sample_pool_per_group(spark):
    """VERDICT r9 #6: pool_per_group=True draws the ticket race within
    each stratum, so anchors see candidates from EVERY other group
    even when the global race would be dominated by one huge group.
    Pinned against an exact Python md5 replay (same tickets), plus
    determinism across runs."""
    import hashlib

    from hbase_gis_spark.operators.corpus import negative_sample_k

    # group "big" dominates any global pool; "s1"/"s2" are tiny
    rows = (
        [(i, "big") for i in range(1000, 1100)]
        + [(1, "s1"), (2, "s1"), (3, "s2"), (4, "s2")]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    K, POOL = 6, 3

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    # python replay: per-group pool = POOL smallest pool-tickets
    by_group = {}
    for i, g in rows:
        by_group.setdefault(g, []).append(i)
    pool = []
    for g, ids in by_group.items():
        ids.sort(key=lambda i: (md5(f"negpool:{i}"), i))
        pool += [(i, g) for i in ids[:POOL]]
    expect = []
    src = dict(rows)
    for a, ga in rows:
        cands = [
            (md5(f"neg:{a}:{n}"), n) for n, gn in pool
            if n != a and gn != ga
        ]
        cands.sort()
        expect += [(a, n, r + 1) for r, (_, n) in enumerate(cands[:K])]
    got = sorted(
        map(tuple, negative_sample_k(
            df, K, pool=POOL, pool_per_group=True
        ).collect())
    )
    assert got == sorted(expect)
    # the small groups ARE represented in every big-group anchor's
    # negatives (the property the option exists for): with the global
    # pool of 3 the race is won by "big" members almost surely and
    # s1/s2 anchors would all share them — here each big anchor draws
    # from s1 and s2 members among its 6 negatives
    negs_of_big = {
        a: {n for aa, n, _ in got if aa == a} for a, g in rows if g == "big"
    }
    for negs in negs_of_big.values():
        assert {src[n] for n in negs} == {"s1", "s2"}
    # deterministic: a second run is row-identical
    again = sorted(
        map(tuple, negative_sample_k(
            df, K, pool=POOL, pool_per_group=True
        ).collect())
    )
    assert got == again


def test_split_drift_audit_one_bridge_flips_one_cluster(spark):
    """VERDICT r9 #5 property: adding ONE bridging duplicate pair
    merges two clusters and flips EXACTLY the absorbed cluster's
    documents to the surviving cluster's split — nothing else moves.
    Cluster ids 1 ('test' under even md5 weights) and 10 ('val') are
    chosen so the merged label provably changes the split."""
    from hbase_gis_spark.operators.dedup import (
        leakage_safe_split,
        split_drift_audit,
    )

    W = {"train": 1, "val": 1, "test": 1}
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 10, 11, 20, 30)], "doc_id bigint"
    )
    pairs_old = spark.createDataFrame(
        [(1, 2), (10, 11)], "id_a bigint, id_b bigint"
    )
    # the new snapshot discovers ONE bridging near-dup pair (2, 10)
    pairs_new = pairs_old.union(
        spark.createDataFrame([(2, 10)], "id_a bigint, id_b bigint")
    )
    old = leakage_safe_split(docs, pairs_old, weights=W)
    new = leakage_safe_split(docs, pairs_new, weights=W)
    # sanity on the deterministic md5 buckets the scenario relies on
    old_map = {r.doc_id: (r.cluster_id, r.split) for r in old.collect()}
    assert old_map[1] == (1, "test") and old_map[10] == (10, "val")
    new_map = {r.doc_id: (r.cluster_id, r.split) for r in new.collect()}
    assert new_map[10] == (1, "test") and new_map[11] == (1, "test")

    out = split_drift_audit(old, new).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r.from_split, r.to_split, r.cluster_id,
        r.n_docs, r.min_doc_id, r.max_doc_id,
    ) == ("val", "test", 1, 2, 10, 11)
    # and with NO new pair, the audit is empty (stability base case)
    assert split_drift_audit(old, old.select(
        "doc_id", "cluster_id", "split"
    )).count() == 0


def test_epoch_allocation_arithmetic_and_contracts(spark):
    """epoch_allocation: exact integer milli arithmetic, zero-weight
    and zero-token edge behavior, and the argument contracts."""
    from hbase_gis_spark.operators.corpus import epoch_allocation

    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 50), ("c", 0), ("d", 10)],
        "source string, n_tokens bigint",
    )
    # explicit budget: 1000 tokens; weights: a=500, b=250, c=250
    out = {
        r.source: r
        for r in epoch_allocation(
            df, {"a": 500, "b": 250, "c": 250},
            budget_tokens=1000, cap_milli=2000,
        ).collect()
    }
    a = out["a"]  # corpus 200, alloc 1000*500 div 1000 = 500
    assert (a.corpus_tokens, a.alloc_tokens, a.epochs_milli) == (
        200, 500, 2500,  # 2.5 epochs
    )
    assert a.over_cap == 1  # 2500 > 2000
    b = out["b"]  # corpus 50, alloc 250 -> 5 epochs
    assert (b.alloc_tokens, b.epochs_milli, b.over_cap) == (250, 5000, 1)
    c = out["c"]  # zero-token source: nothing to repeat
    assert c.alloc_tokens == 250 and c.epochs_milli is None
    assert c.over_cap == 0
    d = out["d"]  # absent from weights: weight 0, never flagged
    assert (d.weight_milli, d.alloc_tokens, d.epochs_milli, d.over_cap) \
        == (0, 0, 0, 0)
    # corpus-relative budget: 2x of total (260) = 520
    rel = {
        r.source: r
        for r in epoch_allocation(
            df, {"a": 1000}, budget_milli_of_corpus=2000
        ).collect()
    }
    assert rel["a"].alloc_tokens == 520
    with pytest.raises(ValueError, match="exactly one"):
        epoch_allocation(df, {"a": 1000})
    with pytest.raises(ValueError, match="exactly one"):
        epoch_allocation(
            df, {"a": 1000}, budget_tokens=1, budget_milli_of_corpus=1
        )
    with pytest.raises(ValueError, match="non-negative"):
        epoch_allocation(df, {"a": -1}, budget_tokens=1)


def test_retrieval_mrr_exact_reciprocals(spark):
    """retrieval_mrr_report: rr_x2520 is the exact integer 2520/rank
    for hits and 0 for misses; the true top-1 matches a numpy replay."""
    import numpy as np

    from hbase_gis_spark.operators.similarity import retrieval_mrr_report

    rng = np.random.default_rng(7)
    V = rng.normal(size=(60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(60)],
        "vec_id bigint, embedding array<float>",
    )
    qids = [3, 17]
    out = {
        r.query_id: r
        for r in retrieval_mrr_report(
            df, qids, 10, nlist=4, nprobe=4, train_rows=60, seed=13
        ).collect()
    }
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for q in qids:
        cos = Vn @ Vn[q]
        cos[q] = -2
        true_id = int(np.argmax(cos))
        r = out[q]
        assert r.true_id == true_id
        # nprobe == nlist probes EVERY cell -> the approximate arm is
        # exhaustive, so the true top-1 must surface at rank 1
        assert r.rank_in_approx == 1 and r.rr_x2520 == 2520
    # a miss reports 0/0: nprobe=1 may drop the true neighbor's cell;
    # force a miss by checking the rr convention directly on rank 0
    from pyspark.sql import functions as F2

    miss = retrieval_mrr_report(
        df, qids, 1, nlist=16, nprobe=1, train_rows=60, seed=13
    ).filter(F2.col("rank_in_approx") == 0).collect()
    for r in miss:
        assert r.rr_x2520 == 0


def test_mann_whitney_auc_hand_computed(spark):
    """Exact AUC vs a hand count: scores pos={3,5,5,8}, neg={2,5,7}.
    Pos>neg wins: (3>2), (5>2)x2, (8>2), (8>5), (8>7) = 6; ties
    (5,5)x2 earn half credit; total pairs 12 -> u_x2 = 2*6 + 2 = 14,
    AUC = 7/12 = 0.583333. Plus a perfect key, a reversed key, a
    one-class key (NULL auc), and NULL hygiene."""
    from hbase_gis_spark.operators.drift import mann_whitney_auc

    rows = (
        [("mix", s, 1) for s in (3, 5, 5, 8)]
        + [("mix", s, 0) for s in (2, 5, 7)]
        + [("perfect", 10, 1), ("perfect", 11, 1), ("perfect", 1, 0)]
        + [("reversed", 1, 1), ("reversed", 9, 0)]
        + [("oneclass", 4, 1), ("oneclass", 6, 1)]
        + [("mix", None, 1), ("mix", 99, None)]  # dropped
    )
    df = spark.createDataFrame(
        rows, "k string, score int, label int"
    )
    out = {r.k: r for r in mann_whitney_auc(df, "k", "score", "label").collect()}
    m = out["mix"]
    assert (m.n_pos, m.n_neg, m.u_x2, m.auc_micro) == (4, 3, 14, 583333)
    p = out["perfect"]
    assert (p.n_pos, p.n_neg, p.u_x2, p.auc_micro) == (2, 1, 4, 1000000)
    r = out["reversed"]
    assert (r.u_x2, r.auc_micro) == (0, 0)
    o = out["oneclass"]
    assert o.n_neg == 0 and o.auc_micro is None


def test_count_min_audit_guarantee_and_collisions(spark):
    """CMS invariants: estimate >= exact for every key (the one-sided
    error guarantee), exact equality when the width is collision-free,
    forced overestimates at width 1 (every key shares one bucket:
    estimate == total rows), and deeper sketches never estimate
    higher."""
    from pyspark.sql import functions as F2

    from hbase_gis_spark.operators.drift import count_min_audit

    rows = [(f"k{i % 7}",) for i in range(100)]  # 7 keys, skewed 15/14
    df = spark.createDataFrame(rows, "term string")
    exact = {r.term: r.exact for r in df.groupBy(
        F2.col("term")).agg(F2.count(F2.lit(1)).alias("exact")).collect()}

    wide = count_min_audit(df, "term", top_n=7, depth=3, width=4096).collect()
    assert len(wide) == 7
    for r in wide:
        assert r.cms_estimate >= r.exact and r.exact == exact[r.term]
        assert r.overestimate == r.cms_estimate - r.exact
    # 7 keys into 4096 buckets x 3 rows: min over rows is collision-
    # free with near-certainty for this fixed hash draw — pin it
    assert all(r.overestimate == 0 for r in wide)

    narrow = count_min_audit(df, "term", top_n=7, depth=2, width=1
                             ).collect()
    for r in narrow:  # one bucket: every estimate is the grand total
        assert r.cms_estimate == 100 and r.overestimate == 100 - r.exact

    # monotone in depth: extra hash rows can only LOWER the min
    d1 = {r.term: r.cms_estimate for r in count_min_audit(
        df, "term", top_n=7, depth=1, width=4).collect()}
    d3 = {r.term: r.cms_estimate for r in count_min_audit(
        df, "term", top_n=7, depth=3, width=4).collect()}
    assert all(d3[k] <= d1[k] for k in d1)
    assert any(v > exact[k] for k, v in d3.items())  # width 4 collides

    import pytest as _pytest

    with _pytest.raises(ValueError, match="depth and width"):
        count_min_audit(df, "term", depth=0)

    # NULL keys are excluded up front (SQL-twin parity by construction)
    withnull = df.union(
        spark.createDataFrame([(None,), (None,)], "term string")
    )
    again = count_min_audit(withnull, "term", top_n=10, depth=2,
                            width=4096).collect()
    assert {r.term for r in again} == set(exact)


def test_cell_pyramid_hierarchy_and_single_shuffle(spark):
    """Pyramid invariants: every level's counts sum to the point
    total; each child cell's count folds into exactly the parent bin
    given by the bit-shift (floor(x·2^a) >> (a−b) == floor(x·2^b),
    clamp included); and the whole pyramid runs in ONE exchange."""
    import random

    from hbase_gis_spark.operators.spatial_join import cell_pyramid

    rng = random.Random(11)
    pts = [
        (rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(400)
    ] + [(180.0, 90.0), (-180.0, -90.0)]  # closed-top edges
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = cell_pyramid(df, precisions=(2, 3, 4))
    rows = out.collect()
    by_p = {}
    for r in rows:
        by_p.setdefault(r.precision, {})[(r.lon_bin, r.lat_bin)] = r.n_points
    for p, cells in by_p.items():
        assert sum(cells.values()) == len(pts), p
    for child, parent in ((3, 2), (4, 3)):
        dl = (5 * child + 1) // 2 - (5 * parent + 1) // 2
        dt = (5 * child) // 2 - (5 * parent) // 2
        folded = {}
        for (lb, tb), n in by_p[child].items():
            key = (lb >> dl, tb >> dt)
            folded[key] = folded.get(key, 0) + n
        assert folded == by_p[parent], (child, parent)
    # one scan, one shuffle: exactly one Exchange in the (final) plan
    # (AdaptiveSparkPlan.toString appends the pre-AQE initial plan —
    # count only the final section)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, plan

    with pytest.raises(ValueError, match="1..12"):
        cell_pyramid(df, precisions=(0,))


def test_snm_sort_cols_contracts(spark):
    """sort_cols rejects duplicates and id/text collisions loudly."""
    from hbase_gis_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "a b c", 5)], "doc_id bigint, text string, n_chars int"
    )
    with pytest.raises(ValueError, match="repeat"):
        sorted_neighborhood_pairs(df, sort_cols=["n_chars", "n_chars"])
    with pytest.raises(ValueError, match="id or text"):
        sorted_neighborhood_pairs(df, sort_cols=["doc_id"])
    with pytest.raises(ValueError, match="at least one"):
        sorted_neighborhood_pairs(df, sort_cols=[])


def test_snm_shared_prefix_order_exact(spark):
    """VERDICT r10 #7 — the prefix-length contract: when EVERY key is
    identical through the surrogate's 8-byte prefix, range boundaries
    cannot split the tied mass (the documented shard-granularity
    limit), but order — and hence neighborhood recall — must be
    byte-for-byte identical to both a single-shard run and a Python
    replay of the full native string order. A silent collapse to
    id-order (the failure this pins against) would pair different
    rows and flunk the replay."""
    from hbase_gis_spark.operators.dedup import sorted_neighborhood_pairs

    # 30 docs; every title shares the 12-byte prefix "sharedprefix"
    # (> 8 surrogate bytes), ordering information lives ONLY beyond
    # the prefix. Texts are built so each doc is a near-dup of its
    # successor under the full-string title order, and that order is
    # a permutation of id order (suffix reverses the id sequence).
    rows = []
    for i in range(30):
        words = " ".join(f"w{i // 2}x{j}" for j in range(6))
        rows.append((i, words, f"sharedprefix-{29 - i:02d}"))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, title string"
    )
    W, TH = 3, 0.5

    order = sorted(rows, key=lambda r: (r[2], r[0]))
    expect = set()
    for i, a in enumerate(order):
        for b in order[i + 1 : i + W]:
            sa, sb = _shingles(a[1]), _shingles(b[1])
            u = len(sa | sb)
            if u and len(sa & sb) / u >= TH:
                expect.add(tuple(sorted((a[0], b[0]))))
    assert expect, "fixture must produce true pairs"

    def run(n_shards):
        return {
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(
                df,
                sort_col="title",
                window=W,
                threshold=TH,
                n_shards=n_shards,
            ).collect()
        }

    single = run(1)
    with pytest.warns(RuntimeWarning, match="tie-mass skew"):
        sharded = run(8)
    assert single == expect
    assert sharded == expect  # sharding never changes the order
