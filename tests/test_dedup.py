"""Dedup operator tests: exact, MinHash-LSH recall, SimHash banding."""

import pytest
from pyspark.sql import functions as F

from hbase_gis_spark.operators.dedup import (
    dedup_exact,
    embedding_dup_lsh,
    embedding_dup_pairs,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
    word_shingles,
)
from hbase_gis_spark.sources.tables import load_table
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF0001, "documents").cache()


def test_dedup_exact_first_wins(spark):
    df = spark.createDataFrame(
        [(3, "a b c"), (1, "a b c"), (2, "x y z")], "doc_id int, text string"
    )
    kept = sorted(r.doc_id for r in dedup_exact(df).collect())
    assert kept == [1, 2]


def test_dedup_exact_normalized(spark):
    df = spark.createDataFrame(
        [(1, "A  b   C"), (2, "a b c"), (3, "other")], "doc_id int, text string"
    )
    kept = sorted(r.doc_id for r in dedup_exact(df, normalize=True).collect())
    assert kept == [1, 3]


def test_word_shingles_short_doc_guard(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two three four")], "doc_id int, text string"
    )
    out = df.select("doc_id", word_shingles("text", 3).alias("s")).collect()
    by_id = {r.doc_id: r.s for r in out}
    assert by_id[1] == []
    assert by_id[2] == ["one two three", "two three four"]


def test_minhash_lsh_matches_exact_pairs(docs):
    """LSH banding recall on the planted near-dups (the clean >=0.9
    jaccard cluster) must be total: candidates then exact verify
    reproduce the exact pairwise operator's output."""
    exact = {(r.id_a, r.id_b) for r in jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert lsh == exact and len(exact) > 0


def test_minhash_lsh_matches_exact_pairs_sf001(spark):
    """Round-start tripwire (ADVICE r2): four registry queries
    (dedup_clusters, dedup_keep_best, dup_source_matrix,
    corpus_pipeline) feed minhash_lsh_pairs into plans whose DuckDB
    oracles use EXACT n-gram Jaccard SQL — their correctness rows stay
    green only while LSH recall is 100% on the current corpus.  The
    driver checks them at sf0.01, so assert the LSH == exact equality
    there, with the registry's own parameters, the moment the (possibly
    regenerated) testdata is first touched — not after four downstream
    queries go red."""
    import __spark_entry__ as entry

    docs01 = load_table(spark, "/root/testdata/sf0.01", "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            docs01, n=entry.JACCARD_N, threshold=entry.JACCARD_T
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs01, n=entry.JACCARD_N, threshold=entry.JACCARD_T
        ).collect()
    }
    assert lsh == exact and len(exact) > 0


def test_simhash_banding_is_exact(docs):
    """Pigeonhole banding must find EXACTLY the pairs within the
    Hamming ball — compare against brute-force pairwise popcount."""
    d = 4
    sh = docs.select(F.col("doc_id").alias("id"), simhash("text").alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("h"),
        )
        .filter(F.col("h") <= d)
        .collect()
    }
    banded = {
        (r.id_a, r.id_b) for r in simhash_pairs(docs, max_hamming=d).collect()
    }
    assert banded == brute and len(brute) > 0


def test_simhash_insensitive_to_word_order(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta gamma beta alpha")],
        "doc_id int, text string",
    )
    vals = [r.s for r in df.select(simhash("text").alias("s")).collect()]
    assert vals[0] == vals[1]


def test_embedding_dup_pairs_symmetric_threshold(spark):
    emb = load_table(spark, SF0001, "embeddings")
    out = embedding_dup_pairs(emb, threshold=0.4).collect()
    assert all(r.id_a < r.id_b and r.cosine >= 0.4 for r in out)
    assert len(out) > 0


def test_embedding_dup_lsh_recall_vs_exact(spark):
    """The LSH-banded scale path against the all-pairs ground truth:
    every emitted pair is a true pair with an identical cosine
    (candidates are verified exactly), and recall stays ≥0.9 even at
    the adversarially low 0.4 threshold (the synthetic dups sit at
    cos 0.40-0.6 ≈ 66°, near the worst case for sign-bit LSH)."""
    emb = load_table(spark, SF0001, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_pairs(emb, threshold=0.4).collect()
    }
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_lsh(emb, threshold=0.4).collect()
    }
    assert set(got) <= set(exact)  # no false positives
    for k, v in got.items():
        assert v == exact[k]  # exact verification, not an estimate
    assert len(got) / len(exact) >= 0.9


def test_embedding_dup_lsh_max_bucket_bounds_work(spark):
    """A degenerate corpus (every vector identical → every band bucket
    holds ALL ids) stays bounded under max_bucket: buckets above the
    cap are dropped wholesale, so no pairs come out — instead of n²/2
    pair rows from every one of the 16 bands."""
    n = 40
    rows = [(i, [1.0] * 8 + [0.0] * 56) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    capped = embedding_dup_lsh(df, threshold=0.9, max_bucket=10).collect()
    assert capped == []
    full = embedding_dup_lsh(df, threshold=0.9).collect()
    assert len(full) == n * (n - 1) // 2


def test_derive_band_bits_density_rule():
    """band_bits=None sizing lands inside the measured density
    envelope (benchdata/lsh_density_tuning.json): the chance bucket
    n / 2^bits stays within ~2x of target_bucket in log space at two
    corpus sizes an order of magnitude apart, the width always tiles
    n_planes, and it GROWS with n (the tuning lesson: band_bits is
    the density knob, max_bucket is not)."""
    import math

    from hbase_gis_spark.operators.similarity import derive_band_bits

    small = derive_band_bits(500, n_planes=64, target_bucket=64)
    large = derive_band_bits(20_000, n_planes=64, target_bucket=64)
    assert 64 % small == 0 and 64 % large == 0
    assert large > small
    for n, bits in ((500, small), (20_000, large)):
        chance_bucket = n / 2.0**bits
        # within one octave of target on either side, except when the
        # corpus is so small that even 1-bit bands are under target
        assert (
            abs(math.log2(max(chance_bucket, 1.0) / 64.0)) <= 1.0
            or bits == 1
        ), (n, bits, chance_bucket)
    # the 20k tuning fixture measured bb8 as the well-conditioned
    # setting at realistic thresholds -- the rule must reproduce it
    assert large == 8
    # degenerate floors/ceilings stay legal divisors
    assert derive_band_bits(10, n_planes=64) == 1
    assert derive_band_bits(10**9, n_planes=64) >= 16


def test_embedding_dup_lsh_auto_band_bits_matches_explicit(spark):
    """band_bits=None routes through derive_band_bits and returns
    exactly the explicit-width result (seeded planes unchanged), so
    the auto mode inherits the verified-exact-cosine property."""
    from hbase_gis_spark.operators.similarity import derive_band_bits

    emb = load_table(spark, SF0001, "embeddings")
    n = emb.count()
    bits = derive_band_bits(n, n_planes=64, target_bucket=64)
    auto = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_dup_lsh(
            emb, threshold=0.4, band_bits=None
        ).collect()
    )
    explicit = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_dup_lsh(
            emb, threshold=0.4, band_bits=bits
        ).collect()
    )
    assert auto == explicit and len(auto) > 0


def test_jaccard_max_df_drops_stop_shingles(spark):
    """max_df prunes hot posting lists: a stop shingle shared by every
    doc stops generating pairs, while pairs with enough rare-shingle
    overlap survive with an unchanged-or-lower jaccard estimate (never
    higher → no false positives vs the exact result)."""
    stop = "the quick brown"  # one 3-shingle shared by all docs
    corpus = [
        (0, f"{stop} alpha beta gamma delta"),
        (1, f"{stop} alpha beta gamma epsilon"),  # near-dup of 0
        (2, f"{stop} zeta eta theta iota"),       # only stop overlap
        (3, f"{stop} kappa lmbda mu nu"),         # only stop overlap
    ]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(df, threshold=0.1).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(df, threshold=0.1, max_df=3).collect()
    }
    assert set(capped) <= set(exact)
    for k, v in capped.items():
        assert v <= exact[k]
    # the near-dup pair survives; stop-shingle-only pairs are gone
    assert (0, 1) in capped
    assert all(k == (0, 1) or k not in capped for k in exact)


def test_split_assign_deterministic_and_proportional(docs):
    from hbase_gis_spark.operators.dedup import split_assign

    a = {r.doc_id: r.split for r in split_assign(docs).collect()}
    b = {r.doc_id: r.split for r in split_assign(docs).collect()}
    assert a == b  # stable across runs
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.9 < train / n <= 1.0  # ~98% with hash variance
    assert set(a.values()) <= {"train", "val", "test"}


def test_jaccard_pairs_matches_bruteforce(spark):
    """Property check: the inverted-index jaccard_pairs equals brute
    force over a small adversarial corpus (shared shingles, exact
    duplicates, short docs below the shingle width, empty-ish docs)."""
    corpus = [
        (0, "a b c d e f"),
        (1, "a b c d e g"),          # high overlap with 0
        (2, "a b c d e f"),          # exact dup of 0
        (3, "x y z w v u"),          # disjoint
        (4, "a b"),                  # too short for 3-shingles
        (5, "a b c"),                # single shingle
        (6, "a b c"),                # dup of 5
        (7, "q q q q q q q q"),      # degenerate repeated token
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])

    def shingles(t, n=3):
        w = t.split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    expect = set()
    for i, (ia, ta) in enumerate(corpus):
        for ib, tb in corpus[i + 1:]:
            sa, sb = shingles(ta), shingles(tb)
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 0.0
            if j >= 0.3:
                expect.add((ia, ib, round(j, 9)))
    from hbase_gis_spark.operators.dedup import jaccard_pairs

    got = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in jaccard_pairs(df, threshold=0.3).collect()
    }
    assert got == expect and len(expect) > 0


def test_near_dup_clusters_chain_and_singletons(spark):
    """Chain 0-1, 1-2 plus pair 5-6 collapse to min labels; 3, 4 stay
    singletons."""
    from hbase_gis_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(7)], ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 1.0)], ["id_a", "id_b", "jaccard"]
    )
    got = {r.doc_id: r.cluster_id for r in near_dup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5}


def test_cluster_representatives_keep_best(spark):
    """Per cluster: highest score wins, ties break to smallest id;
    singletons keep themselves."""
    from hbase_gis_spark.operators.dedup import (
        cluster_representatives,
        near_dup_clusters,
    )

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(5)], ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], ["id_a", "id_b", "jaccard"]
    )
    clusters = near_dup_clusters(docs, pairs)
    scores = spark.createDataFrame(
        [(0, 0.5), (1, 0.9), (2, 0.9), (3, 0.1), (4, 0.2)],
        ["doc_id", "quality_score"],
    )
    got = {
        r.cluster_id: (r.doc_id, r.quality_score)
        for r in cluster_representatives(clusters, scores).collect()
    }
    # cluster {0,1,2}: 1 and 2 tie at 0.9 -> smallest id 1 wins
    assert got == {0: (1, 0.9), 3: (3, 0.1), 4: (4, 0.2)}


def test_stratified_sample_deterministic_and_sized(docs):
    """Same rows kept across invocations; per-stratum rates near the
    requested fractions; unnamed strata drop."""
    from hbase_gis_spark.operators.dedup import stratified_sample

    base = docs.withColumn("parity", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"))
    fr = {"even": 0.5}
    a = {r.doc_id for r in stratified_sample(base, "parity", fr).collect()}
    b = {r.doc_id for r in stratified_sample(base, "parity", fr).collect()}
    assert a == b and all(i % 2 == 0 for i in a)
    n_even = base.filter(F.col("parity") == "even").count()
    assert 0.35 * n_even < len(a) < 0.65 * n_even


# ----------------------------------------------------------- span dedup ---


def test_dup_ngram_spans_crafted(spark):
    from hbase_gis_spark.operators.dedup import dup_ngram_spans

    shared = "one two three four five six seven eight"
    rows = [
        (1, f"{shared} tail a"),
        (2, f"head b {shared}"),
        (3, "completely different words with no overlap at all here"),
        (4, "short doc"),  # < n tokens -> no grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dup_ngram_spans(df, n=8).collect()
    # the shared 8-gram appears in docs 1 and 2
    assert any(r["n_docs"] == 2 and r["first_doc"] == 1 for r in out)
    # nothing claims doc 3 or 4 as duplicated
    assert all(r["n_docs"] >= 2 for r in out)


def test_span_dup_stats_full_duplicate(spark):
    from hbase_gis_spark.operators.dedup import span_dup_stats

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, text), (2, text), (3, "unique tokens only in this doc body x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dup_stats(df, n=8).collect()}
    assert out[1]["dup_frac"] == 1.0 and out[2]["dup_frac"] == 1.0
    assert out[3]["n_dup"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[1]["n_grams"] == 3  # 10 tokens -> 3 positions


def test_minhash_arrow_kernel_bit_identical(spark):
    from pyspark.sql import functions as F
    from hbase_gis_spark.operators.dedup import (
        minhash_signature_from_hashes,
        shingle_hashes32,
        word_shingles,
    )

    rows = [(1, "a b c d e f g h"), (2, "x y z w v u t s r q"), (3, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = df.select(
        "doc_id",
        shingle_hashes32(word_shingles("text", 3)).alias("h"),
    )
    both = sh.select(
        "doc_id",
        minhash_signature_from_hashes("h", 16, use_arrow=True).alias("sa"),
        minhash_signature_from_hashes("h", 16, use_arrow=False).alias("se"),
    ).collect()
    for r in both:
        assert r["sa"] == r["se"], r["doc_id"]
    # doc 3 has < 3 tokens -> empty shingle set -> all-null signature
    d3 = [r for r in both if r["doc_id"] == 3][0]
    assert d3["sa"] == [None] * 16


def test_edit_distance_pairs_blocking_and_verify(spark):
    from hbase_gis_spark.operators.dedup import edit_distance_pairs

    rows = [
        (1, "hello world this is a doc"),
        (2, "hello world this is a dog"),     # 1 substitution from doc 1
        (3, "hello world this is entirely different text"),  # same block, far
        (4, "goodbye world this is a doc"),   # different first token: unblocked
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r.id_a, r.id_b): r.edit_dist for r in
           edit_distance_pairs(df, max_dist=3).collect()}
    assert out.get((1, 2)) == 1
    assert (1, 3) not in out      # verified and rejected (dist > 3)
    assert (1, 4) not in out      # blocked away (first token differs)


def test_dedup_incremental_reasons_and_cap(spark):
    """Incremental dedup vs a catalog: exact text match wins over near,
    near requires shingle-Jaccard >= threshold, unseen docs keep
    (dup_of NULL); with max_df the flagged set is a subset of uncapped
    (false negatives only)."""
    from hbase_gis_spark.operators.dedup import dedup_incremental

    cat_rows = [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "completely unrelated catalog document about spark plans"),
    ]
    inc_rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),   # exact
        (2, "the quick brown fox jumps over the lazy cat today"),   # near
        (3, "nothing in common with anything in the catalog corpus"),
    ]
    cat = spark.createDataFrame(cat_rows, ["doc_id", "text"])
    inc = spark.createDataFrame(inc_rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.dup_of, r.reason)
        for r in dedup_incremental(inc, cat, threshold=0.3).collect()
    }
    assert out[1] == (100, "exact")
    assert out[2] == (100, "near")
    assert out[3] == (None, None)

    uncapped = {
        r.doc_id for r in dedup_incremental(inc, cat, threshold=0.3).collect()
        if r.reason is not None
    }
    capped = {
        r.doc_id
        for r in dedup_incremental(inc, cat, threshold=0.3, max_df=1).collect()
        if r.reason is not None
    }
    assert capped <= uncapped


def test_cell_footprint_pairs_matches_bruteforce(spark):
    """Inverted-index footprint Jaccard == brute-force over all entity
    pairs (distinct-cell semantics, duplicate visits collapse)."""
    import itertools

    from hbase_gis_spark.operators.dedup import cell_footprint_pairs

    rows = [
        (1, 10), (1, 11), (1, 12), (1, 12),     # dup visit collapses
        (2, 10), (2, 11), (2, 13),
        (3, 20), (3, 21),
        (4, 10), (4, 11), (4, 12), (4, 13),
    ]
    df = spark.createDataFrame(rows, ["user_id", "cell"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in cell_footprint_pairs(df, threshold=0.3).collect()
    }

    sets = {}
    for u, c in rows:
        sets.setdefault(u, set()).add(c)
    expect = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        if i == 0:
            continue
        j = i / (len(sets[a]) + len(sets[b]) - i)
        if j >= 0.3:
            expect[(a, b)] = j
    assert got == expect and len(expect) > 0


def test_jaccard_prefix_filter_equals_inverted_index(spark):
    """Prefix filtering (AllPairs/PPJoin candidates) must return
    EXACTLY the inverted-index result — completeness of the
    both-prefix join under the global rarity order, plus a skewed
    hand corpus where stop-shingles exist (the case max_df would
    lose pairs on but the prefix scheme must not)."""
    from hbase_gis_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )
    from hbase_gis_spark.sources.tables import load_table
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    a = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    b = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs_prefix(docs, n=3, threshold=0.5).collect()
    }
    assert a == b and len(a) > 0

    # zipfian hand corpus: 'the common stop run' appears everywhere
    stop = "the of and a to in is it on at"
    rows = [
        (1, f"{stop} alpha beta gamma delta"),
        (2, f"{stop} alpha beta gamma epsilon"),
        (3, f"{stop} zeta eta theta iota"),
        (4, f"{stop} zeta eta theta kappa"),
        (5, "totally different words here entirely unrelated content"),
    ]
    hand = spark.createDataFrame(rows, "doc_id bigint, text string")
    ha = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs(hand, n=2, threshold=0.4).collect()
    }
    hb = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs_prefix(hand, n=2, threshold=0.4).collect()
    }
    assert ha == hb and len(ha) > 0


def test_cell_footprint_pairs_max_df_false_negative_only(spark):
    """The hot-cell cap drops pairs only (never adds or rescores):
    capping df<=2 removes pairs that depended on the plaza cell 10
    (visited by 3 users) but keeps every other pair at its exact
    jaccard."""
    from hbase_gis_spark.operators.dedup import cell_footprint_pairs

    rows = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11), (2, 13),
        (3, 20), (3, 21),
        (4, 10), (4, 20), (4, 21),
    ]
    df = spark.createDataFrame(rows, ["user_id", "cell"])
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in cell_footprint_pairs(df, threshold=0.1).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in cell_footprint_pairs(df, threshold=0.1, max_df=2).collect()
    }
    assert set(capped) < set(full)
    # dropping a shared hot cell can only SHRINK a pair's jaccard
    # (intersection loses the cell, set sizes keep their true values)
    for k, v in capped.items():
        assert v <= full[k]
    # the pair whose ONLY shared cell was the hot one is gone
    assert (1, 2) in full and (1, 4) in full
    assert (1, 4) not in capped


def _zipf_corpus():
    """Deterministic 300-doc corpus over a 1,200-term Zipfian
    vocabulary: 10 stopword-tier terms ride in EVERY doc (df = n_docs,
    the inverted index's worst-case buckets), the tail is Zipf-sampled
    rare terms, and 20 docs are near-duplicates of existing docs
    (sharing 18/20 rare terms — the pairs the operator must find)."""
    import random

    rng = random.Random(42)
    vocab = [f"t{i:04d}" for i in range(1200)]
    stop, rare = vocab[:10], vocab[10:]
    # zipf weights over the rare tail
    weights = [1.0 / (r + 1) for r in range(len(rare))]
    docs = []
    for i in range(280):
        toks = list(stop) + rng.choices(rare, weights=weights, k=20)
        docs.append((i, " ".join(toks)))
    for j in range(20):  # near-dups of the first 20 docs
        base = docs[j][1].split()
        mutated = list(base)
        mutated[12] = rng.choice(rare)  # swap 2 of the 20 rare tokens
        mutated[13] = rng.choice(rare)
        docs.append((280 + j, " ".join(mutated)))
    return docs


def _brute_tfidf_pairs(docs, threshold):
    """Uncapped n^2 oracle replaying the operator's exact integer
    formula: w = tf * HALF_UP(ln((N+1)/(df+1)) * 1000)."""
    import itertools
    import math

    n = len(docs)
    tf, dfreq = {}, {}
    for i, text in docs:
        counts = {}
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
        tf[i] = counts
        for t in counts:
            dfreq[t] = dfreq.get(t, 0) + 1
    w = {
        i: {
            t: c * int(math.floor(math.log((n + 1) / (dfreq[t] + 1)) * 1000 + 0.5))
            for t, c in counts.items()
        }
        for i, counts in tf.items()
    }
    norm = {i: math.sqrt(float(sum(x * x for x in ws.values()))) for i, ws in w.items()}
    out = {}
    for a, b in itertools.combinations(sorted(w), 2):
        wa, wb = w[a], w[b]
        if len(wb) < len(wa):
            wa, wb = wb, wa
        dot = sum(x * wb[t] for t, x in wa.items() if t in wb)
        cos = dot / (norm[a] * norm[b])
        if cos >= threshold:
            out[(a, b)] = cos
    return out


def test_tfidf_cosine_pairs_zipfian_vocabulary(spark):
    """The uncapped operator is EXACT against an n^2 brute oracle on a
    realistic Zipfian vocabulary, and the max_df guard prunes exactly
    the stopword tier: bucket-join work collapses to sum(df^2) over
    surviving buckets — >20x below the uncapped sum(df^2), which the
    stop tier alone pushes past 10*C(n,2) — while the qualifying pair set is
    UNCHANGED (stopword-bucket weight is too small to cross the
    threshold margin). Pins the at-scale shape the registry's 500-doc
    cap hides (VERDICT r3 next-round #3)."""
    from hbase_gis_spark.operators.dedup import _bucket_pairs, tfidf_cosine_pairs, tokens

    corpus = _zipf_corpus()
    sdf = spark.createDataFrame(corpus, "doc_id bigint, text string")
    threshold, cap, n = 0.6, 50, len(corpus)
    brute = _brute_tfidf_pairs(corpus, threshold)
    assert len(brute) >= 15  # the near-dup pairs are actually found

    # 1. uncapped operator == brute oracle, cosine to float precision
    uncapped = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(sdf, threshold, max_df=None).collect()
    }
    assert set(uncapped) == set(brute)
    assert all(abs(uncapped[p] - brute[p]) < 1e-9 for p in brute)

    # 2. the guard prunes the stopword tier: every surviving bucket is
    #    a rare term, and the candidate count is sum over surviving
    #    buckets of C(df,2) — a tiny fraction of the n^2 pair space
    toks = sdf.select(
        F.col("doc_id").alias("id"), F.explode(tokens("text")).alias("term")
    )
    dfreq = (
        toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    all_df = {r.term: r.df for r in dfreq.collect()}
    surviving = {t: d for t, d in all_df.items() if d <= cap}
    assert not any(int(t[1:]) < 10 for t in surviving)  # stop tier pruned
    expect_candidates = sum(d * (d - 1) // 2 for d in surviving.values())
    uncapped_work = sum(d * (d - 1) // 2 for d in all_df.values())
    posting = toks.distinct()
    candidates = (
        _bucket_pairs(posting, ["term"], max_bucket=cap)
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    assert candidates <= expect_candidates
    # the stopword tier alone costs 10 * C(n,2) join work uncapped —
    # the guard collapses the bucket-join work by >20x on this corpus
    # and keeps the distinct candidate space subquadratic
    assert uncapped_work > 10 * (n * (n - 1) // 2)
    assert expect_candidates < 0.05 * uncapped_work, (
        f"capped work {expect_candidates} vs uncapped {uncapped_work}"
    )
    assert candidates < 0.4 * (n * (n - 1) // 2), (
        f"{candidates} candidates vs {n * (n - 1) // 2} pairs"
    )

    # 3. capped pair set unchanged (false-negative-only contract holds
    #    with margin on this corpus); capped cosine never exceeds true
    capped = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(sdf, threshold, max_df=cap).collect()
    }
    assert set(capped) == set(brute)
    assert all(capped[p] <= brute[p] + 1e-9 for p in capped)


def test_dedup_recall_report_detects_capped_misses(spark, docs):
    """The health check actually measures what it claims: with a
    max_bucket cap tight enough to drop every band bucket, LSH finds
    nothing and recall reads 0; uncapped banding at 64x16 finds every
    exact pair (recall 1)."""
    from hbase_gis_spark.operators.dedup import dedup_recall_report

    ok = {r.metric: r.value for r in dedup_recall_report(docs).collect()}
    assert ok["recall"] == 1.0 and ok["exact_pairs"] > 0
    assert ok["matched_pairs"] == ok["exact_pairs"]
    capped = {
        r.metric: r.value
        for r in dedup_recall_report(docs, max_bucket=1).collect()
    }
    assert capped["lsh_pairs"] == 0.0 and capped["recall"] == 0.0
    assert capped["exact_pairs"] == ok["exact_pairs"]  # exact side unaffected


def test_containment_pairs_finds_quotes_jaccard_misses(spark):
    """A short doc quoted verbatim inside a long one: containment ~1,
    Jaccard tiny — the asymmetric operator must find it at a threshold
    where the symmetric one provably cannot."""
    from hbase_gis_spark.operators.dedup import containment_pairs

    quote = "to be or not to be that is the question"
    filler = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, quote), (2, f"{filler} {quote}"), (3, "unrelated text here now")],
        "doc_id bigint, text string",
    )
    jac = jaccard_pairs(df, n=3, threshold=0.4).collect()
    assert jac == []  # union dominated by the long doc
    got = {(r.id_a, r.id_b): (r.containment_a, r.containment_b)
           for r in containment_pairs(df, n=3, threshold=0.9).collect()}
    assert set(got) == {(1, 2)}
    ca, cb = got[(1, 2)]
    assert ca == 1.0 and cb < 0.1  # doc 1 fully contained in doc 2


def test_dedup_incremental_stored_matches_on_the_fly(spark, tmp_path):
    """The materialized-catalog path returns IDENTICAL verdicts to the
    compute-on-the-fly path, including after an append (min-id
    exact-match winner re-reduced across batch sidecar rows)."""
    from hbase_gis_spark.operators.dedup import (
        append_catalog_postings,
        dedup_incremental,
        dedup_incremental_stored,
        write_catalog_postings,
    )
    from hbase_gis_spark.sources.tables import load_table
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    cat1 = docs.filter("doc_id % 3 = 0")
    cat2 = docs.filter("doc_id % 3 = 1")
    inc = docs.filter("doc_id % 3 = 2")

    path = str(tmp_path / "catalog")
    write_catalog_postings(cat1, path)
    got1 = {
        r.doc_id: (r.dup_of, r.reason)
        for r in dedup_incremental_stored(inc, path, 0.5).collect()
    }
    exp1 = {
        r.doc_id: (r.dup_of, r.reason)
        for r in dedup_incremental(inc, cat1, threshold=0.5).collect()
    }
    assert got1 == exp1 and len(got1) > 0

    append_catalog_postings(cat2, path)
    got2 = {
        r.doc_id: (r.dup_of, r.reason)
        for r in dedup_incremental_stored(inc, path, 0.5).collect()
    }
    exp2 = {
        r.doc_id: (r.dup_of, r.reason)
        for r in dedup_incremental(
            inc, cat1.unionByName(cat2), threshold=0.5
        ).collect()
    }
    assert got2 == exp2
    # the appended catalog must have changed at least one verdict
    assert got2 != got1


def test_dup_substring_spans_one_span_not_93_grams(spark):
    """A 100-token cross-doc duplicate is reported as ONE maximal
    span of exactly 100 tokens (its 93 consecutive 8-gram anchors
    chained), at each document's own offset — the VERDICT r5 #4
    contract. Same-doc-only repeats and short overlaps produce
    nothing."""
    from hbase_gis_spark.operators.dedup import dup_substring_spans

    shared = " ".join(f"s{i}" for i in range(100))
    selfrep = " ".join(f"r{i % 9}" for i in range(40))  # same-doc repeat
    rows = [
        (1, "a1 a2 a3 " + shared + " z9"),
        (2, "b1 " + shared + " y1 y2"),
        (3, " ".join(f"u{i}" for i in range(30))),
        (4, selfrep),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [
        tuple(r)
        for r in dup_substring_spans(df, n=8, min_len=50)
        .orderBy("doc_id")
        .collect()
    ]
    assert got == [(1, 3, 100, 93), (2, 1, 100, 93)]


def test_dup_substring_spans_unique_gram_breaks_run(spark):
    """Two 60-token duplicates separated by one corpus-unique token
    chain into TWO spans (the documented boundary approximation),
    and min_len filters spans independently."""
    from hbase_gis_spark.operators.dedup import dup_substring_spans

    a = " ".join(f"a{i}" for i in range(60))
    b = " ".join(f"b{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, a + " UNIQ1 " + b), (2, a + " UNIQ2 " + b)],
        "doc_id bigint, text string",
    )
    got = {
        (r.doc_id, r.start_pos): (r.span_len, r.n_anchors)
        for r in dup_substring_spans(df, n=8, min_len=50).collect()
    }
    # doc tokens: a0..a59 (0-59), UNIQx (60), b0..b59 (61-120); the
    # grams touching position 60 are unique per doc, so anchors are
    # 0..52 and 61..113 -> spans (0, 60) and (61, 60)
    assert got == {
        (1, 0): (60, 53),
        (1, 61): (60, 53),
        (2, 0): (60, 53),
        (2, 61): (60, 53),
    }


def test_remove_dup_spans_keep_first(spark):
    """Span removal keeps the corpus-minimal owner's copy intact,
    strips the duplicate from every other doc, never touches clean
    docs, and reports exact removed-token counts; min_len keeps short
    matches."""
    from hbase_gis_spark.operators.dedup import remove_dup_spans

    shared = " ".join(f"s{i}" for i in range(60))
    short = "p q r s t u v w x"  # 9-token cross-doc match < min_len
    rows = [
        (1, "a1 a2 " + shared + " a3"),
        (2, "b1 " + shared + " b2 " + short),
        (3, " ".join(f"u{i}" for i in range(20)) + " " + short),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r for r in remove_dup_spans(df, n=8, min_len=50).collect()
    }
    assert out[1].n_removed == 0 and out[1].text_clean == rows[0][1]
    assert out[2].n_removed == 60
    assert out[2].text_clean == "b1 b2 " + short
    assert out[3].n_removed == 0  # short match survives min_len


def test_dedup_incremental_bucketed_verdicts_and_no_catalog_exchange(spark):
    """The bucketed-catalog probe returns IDENTICAL verdicts to the
    path-parquet stored catalog, and bucketing removes the fact-scale
    postings side's shuffle: with broadcast disabled, the bucketed
    probe plans strictly fewer Exchanges than the parquet probe of the
    same catalog (only the arriving batch shuffles)."""
    import tempfile

    from hbase_gis_spark.operators.dedup import (
        dedup_incremental_bucketed,
        dedup_incremental_stored,
        write_catalog_postings,
        write_catalog_postings_bucketed,
    )
    from hbase_gis_spark.sources.tables import load_table
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    cat = docs.filter("doc_id % 3 < 2")
    inc = docs.filter("doc_id % 3 = 2")
    path = tempfile.mkdtemp(prefix="cat_parquet_")
    write_catalog_postings(cat, path)
    # a previous SESSION may have left the managed-table directories
    # behind (its teardown DROP only ran in its own catalog); clear
    # both the catalog entry and the orphaned location
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("hash", "postings", "meta"):
        spark.sql(f"DROP TABLE IF EXISTS dedup_cat_bkt_{t}")
        shutil.rmtree(f"{wh}/dedup_cat_bkt_{t}", ignore_errors=True)
    write_catalog_postings_bucketed(cat, "dedup_cat_bkt", buckets=8)

    want = {
        r.doc_id: (r.dup_of, r.reason)
        for r in dedup_incremental_stored(inc, path, 0.5).collect()
    }
    got = {
        r.doc_id: (r.dup_of, r.reason)
        for r in dedup_incremental_bucketed(inc, "dedup_cat_bkt", 0.5)
        .collect()
    }
    assert got == want and len(got) > 0

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_parquet = (
            dedup_incremental_stored(inc, path, 0.5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        plan_bucketed = (
            dedup_incremental_bucketed(inc, "dedup_cat_bkt", 0.5)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n_ex_parquet = plan_parquet.count("Exchange")
    n_ex_bucketed = plan_bucketed.count("Exchange")
    assert n_ex_bucketed < n_ex_parquet, (n_ex_bucketed, n_ex_parquet)
    assert "Bucketed: true" in plan_bucketed
