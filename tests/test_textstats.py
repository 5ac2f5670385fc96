"""Text analysis tests: lang-id, quality features, fingerprint."""

import pytest
from pyspark.sql import functions as F

from hbase_gis_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat of the mat and the dog is here"),
            (2, "le chat et la porte les des choses"),
            (3, "der hund und die das ist gut"),
            (4, "el perro los gatos las es una cosa"),
            (5, "zzz qqq www"),
            (6, "the le THE le le"),  # fr=3 beats en=1 (case-sensitive)
        ],
        "doc_id int, text string",
    )


def test_lang_id_markers(df):
    got = {r.doc_id: r.l for r in df.select("doc_id", lang_id("text").alias("l")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und", 6: "fr"}


def test_lang_id_tie_precedence(spark):
    # en and fr tie at 1 marker each -> en wins by precedence order
    d = spark.createDataFrame([(1, "the le")], "doc_id int, text string")
    assert d.select(lang_id("text")).first()[0] == "en"


def test_token_count(spark):
    d = spark.createDataFrame([(1, "  a  b   c  ")], "doc_id int, text string")
    assert d.select(token_count("text")).first()[0] == 3


def test_quality_features_values(spark):
    d = spark.createDataFrame([(1, "aa bb aa")], "doc_id int, text string")
    r = quality_features(d).first()
    assert r.n_tokens == 3
    assert abs(r.ttr - 2.0 / 3.0) < 1e-15
    # 8 chars - 2 separators = 6 letters / 3 tokens = 2.0 mean length
    assert abs(r.mean_token_len - 2.0) < 1e-15
    assert r.stopword_ratio == 0.0


def test_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, " HELLO  WORLD  ")],
        "doc_id int, text string",
    )
    fps = [r.f for r in d.select(fingerprint("text").alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_ngram_contamination_counts(spark):
    """Hand-computable corpus: the train doc sharing 3-grams with the
    test set reports exactly its shared distinct-gram count; disjoint
    train docs report 0 and are still present (total annotation)."""
    from hbase_gis_spark.operators.textstats import ngram_contamination

    train = spark.createDataFrame(
        [
            (1, "a b c d e"),      # shares "a b c","b c d","c d e" with test
            (2, "x y z w v"),      # disjoint
            (3, "a b"),            # too short for 3-grams
        ],
        "doc_id int, text string",
    )
    test = spark.createDataFrame(
        [(100, "q q a b c d e r r")], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in ngram_contamination(train, test, n=3).collect()}
    assert got[1].n_hits == 3 and got[1].n_grams == 3
    assert got[2].n_hits == 0 and got[2].n_grams == 3
    assert got[3].n_hits == 0 and got[3].n_grams == 0


def test_pack_sequences_offsets(spark):
    """Within a shard, token offsets run back-to-back in doc-id order
    and seq_idx is the fixed-length bin of the starting offset."""
    from hbase_gis_spark.operators.textstats import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i))) for i in range(8)],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in pack_sequences(docs, 5, n_shards=2).collect()}
    # shard 0: docs 0,2,4,6 with 3,5,7,9 tokens -> starts 0,3,8,15
    assert [out[i].tok_start for i in (0, 2, 4, 6)] == [0, 3, 8, 15]
    # shard 1: docs 1,3,5,7 with 4,6,8,10 tokens -> starts 0,4,10,18
    assert [out[i].tok_start for i in (1, 3, 5, 7)] == [0, 4, 10, 18]
    assert [out[i].seq_idx for i in (0, 2, 4, 6)] == [0, 0, 1, 3]
    for r in out.values():
        assert r.shard == r.doc_id % 2


def test_top_rare_terms_orders_by_rarity(spark):
    from hbase_gis_spark.operators.textstats import top_rare_terms

    rows = [
        (1, "common common rare1 shared"),
        (2, "common shared other"),
        (3, "common unique3"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = top_rare_terms(df, k=2)
    d1 = sorted(
        [(r.term, r.df, r.rnk) for r in out.collect() if r.doc_id == 1],
        key=lambda t: t[2],
    )
    # doc 1 terms: common(df 3), rare1(df 1), shared(df 2)
    assert d1[0][0] == "rare1" and d1[0][1] == 1
    assert d1[1][0] == "shared" and d1[1][1] == 2
    # duplicate in-doc tokens counted once for df
    dfs = {r.term: r.df for r in out.collect()}
    assert dfs.get("common", 3) == 3


def test_tfidf_topk_terms_hand_computed(spark):
    """TF-IDF on a 3-doc corpus against hand-computed scores."""
    import math

    from hbase_gis_spark.operators.textstats import tfidf_topk_terms

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry"), (3, "durian")],
        "doc_id int, text string",
    )
    rows = tfidf_topk_terms(df, k=2).collect()
    got = {(r.doc_id, r.term): (r.tf, r.doc_freq, r.tfidf, r.rnk) for r in rows}
    idf = lambda df_: round(math.log(4.0 / (df_ + 1.0)), 9)  # noqa: E731
    # doc 1: banana tf=1 df=1 -> ln(2) ~ 0.693 beats apple tf=2 df=2 ->
    # 2*ln(4/3) ~ 0.575 (rarity outweighs the extra occurrence here)
    assert got[(1, "banana")] == (1, 1, idf(1), 1)
    assert got[(1, "apple")] == (2, 2, round(2 * math.log(4.0 / 3.0), 9), 2)
    # doc 3: durian is its only term
    assert got[(3, "durian")] == (1, 1, idf(1), 1)
    assert len(rows) == 5  # 2 + 2 + 1


def test_unigram_lm_score_hand_computed(spark):
    """Mean log unigram prob on a 2-doc corpus: common tokens score
    higher than rare ones."""
    import math

    from hbase_gis_spark.operators.textstats import unigram_lm_score

    df = spark.createDataFrame(
        [(1, "a a a"), (2, "a b")], "doc_id int, text string"
    )
    # corpus: a x4, b x1, total 5
    got = {r.doc_id: r for r in unigram_lm_score(df).collect()}
    assert got[1].n_tokens == 3
    assert got[1].avg_logp == round(math.log(4 / 5), 9)
    assert got[2].n_tokens == 2
    expect2 = round((math.log(4 / 5) + math.log(1 / 5)) / 2, 9)
    assert abs(got[2].avg_logp - expect2) <= 1e-9
    assert got[1].avg_logp > got[2].avg_logp


def test_bpe_pair_counts_hand_computed(spark):
    """Pair counts weight by word frequency and dedupe the corpus to
    its vocabulary: 'abab' twice + 'ab' once -> ab:3(=2+... hand count
    below), deterministic (n desc, pair asc) ordering."""
    from hbase_gis_spark.operators.textstats import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab x")], "doc_id int, text string"
    )
    # vocab: abab x2 (pairs ab,ba,ab), ab x1 (pair ab); 'x' dropped (len<2)
    # ab: 2*2 + 1 = 5 ; ba: 2*1 = 2
    got = [(r.pair, r.n) for r in bpe_pair_counts(df, k=10).collect()]
    assert got == [("ab", 5), ("ba", 2)]


def test_bpe_trainer_hand_computed():
    """Greedy merges on a tiny vocab follow the Sennrich loop: most
    frequent pair merges first, ties break lexicographically, counts
    below 2 stop training."""
    from hbase_gis_spark.operators.textstats import bpe_apply, train_bpe_merges

    # vocab: 'abab' x3, 'abc' x2 -> pair counts: ab:8(3*2+2), ba:3, bc:2
    merges = train_bpe_merges([("abab", 3), ("abc", 2)], 10)
    assert merges[0] == ("a", "b")
    # after merging ab: abab->[ab,ab] (count 3), abc->[ab,c] (count 2)
    # pairs: (ab,ab):3, (ab,c):2 -> next merge (ab,ab)
    assert merges[1] == ("ab", "ab")
    # then [abab] x3, [ab, c] x2 -> (ab,c):2 merges
    assert merges[2] == ("ab", "c")
    assert len(merges) == 3  # nothing left with count >= 2
    assert bpe_apply("abab", merges) == ["abab"]
    assert bpe_apply("abc", merges) == ["abc"]
    assert bpe_apply("zzab", merges) == ["z", "z", "ab"]


def test_bpe_learned_counts_compresses(spark):
    """Learned BPE token counts: repeated words compress to one token,
    OOV falls back to character count."""
    from hbase_gis_spark.operators.textstats import bpe_learned_counts

    df = spark.createDataFrame(
        [(1, "hello hello hello world"), (2, "hello xy")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in
           bpe_learned_counts(df, n_merges=20, vocab_limit=10).collect()}
    # 'hello' (freq 4) trains to a single token; 'world'/'xy' are in
    # vocab too (limit 10) and compress fully given 20 merges
    assert got[1][0] == 4
    assert got[1][1] <= 8
    assert got[2][0] == 2


def test_quality_classifier_matches_python_replay(spark):
    """Hashed-linear scoring replayed token-by-token in pure Python:
    bucket = md5-60bit % QC_DIM, weight = (b*KNUTH) % 2D - D, logit =
    sum/ (D * n). Integer weights ⇒ the comparison is exact."""
    import hashlib

    from hbase_gis_spark.operators.textstats import (
        KNUTH_MULT,
        QC_DIM,
        quality_classifier,
    )
    from hbase_gis_spark.sources.tables import load_table
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    got = {r.doc_id: r for r in quality_classifier(docs).collect()}
    for r in docs.select("doc_id", "text").limit(50).collect():
        toks = r.text.strip().split()
        wsum = 0
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % QC_DIM
            wsum += (b * KNUTH_MULT) % (2 * QC_DIM) - QC_DIM
        g = got[r.doc_id]
        assert g.n_tokens == len(toks)
        assert g.quality_logit == wsum / (QC_DIM * len(toks))
        assert g.keep == (g.quality_logit > 0)


def test_quality_classifier_is_scan_only(spark):
    """Map-only model application: no exchange, no Python stage."""
    from hbase_gis_spark.operators.textstats import quality_classifier
    from hbase_gis_spark.sources.tables import load_table
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    plan = quality_classifier(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_bigram_lm_score_matches_python_replay(spark):
    """Bigram LM replayed in pure Python over the whole sf0.001 corpus
    (corpus-level counts need every doc), compared through the same
    round-9 policy."""
    import math
    from collections import Counter

    from hbase_gis_spark.operators.textstats import bigram_lm_score
    from hbase_gis_spark.sources.tables import load_table
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    rows = docs.select("doc_id", "text").collect()
    pair_c: Counter = Counter()
    left_c: Counter = Counter()
    doc_bgs = {}
    for r in rows:
        toks = r.text.strip().split()
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        doc_bgs[r.doc_id] = bgs
        pair_c.update(bgs)
        left_c.update(t for t in toks[:-1])
    got = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    for did, bgs in doc_bgs.items():
        if not bgs:
            assert did not in got
            continue
        lp = [
            math.log(pair_c[bg] / left_c[bg.split(" ", 1)[0]]) for bg in bgs
        ]
        g = got[did]
        assert g.n_bigrams == len(bgs)
        assert abs(g.avg_logp - sum(lp) / len(lp)) < 1e-8


def test_quality_logit_is_order_invariant(spark):
    """The hashed-linear logit is a sum of per-token integer weights —
    permuting tokens cannot change it (exact, not approximate)."""
    from hbase_gis_spark.operators.textstats import quality_classifier

    rows = [(1, "alpha beta gamma delta"), (2, "delta gamma beta alpha")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.quality_logit
           for r in quality_classifier(df).collect()}
    assert got[1] == got[2]


def test_bm25_integer_replay_and_length_norm(spark):
    import math

    from hbase_gis_spark.operators.textstats import bm25_topk

    docs = [
        (1, "spark line " + "pad " * 40),   # tf(spark)=1, long doc
        (2, "spark line"),                  # tf(spark)=1, short doc
        (3, "spark spark spark line"),      # tf=3
        (4, "other words only here"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = [(r.doc_id, r.score_milli, r.n_terms)
           for r in bm25_topk(df, ["spark"], k=10).collect()]

    def replay():
        toks = {d: t.split() for d, t in docs}
        dl = {d: len(w) for d, w in toks.items()}
        n, s = len(docs), sum(dl.values())
        avgdl = (1000 * s) // n
        tf = {d: w.count("spark") for d, w in toks.items() if "spark" in w}
        dfreq = len(tf)
        idf = round(1000 * math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5)))
        out = []
        for d, t in tf.items():
            ratio = (dl[d] * 1000000) // avgdl
            den = 1000 * t + (1200 * ((1000 - 750)
                              + (750 * ratio) // 1000)) // 1000
            out.append((d, (idf * t * 2200) // den, 1))
        return sorted(out, key=lambda r: (-r[1], r[0]))

    assert got == replay()
    scores = {d: s for d, s, _ in got}
    assert 4 not in scores                      # no query term -> absent
    assert scores[2] > scores[1]                # same tf, shorter doc wins
    assert scores[3] > scores[2]                # higher tf wins
    # saturation: tf=3 is NOT 3x the tf=1 score (k1 caps the growth)
    assert scores[3] < 3 * scores[2]


def test_token_entropy_rate_hand_counts(spark):
    """Hand-checkable corpus: unigrams a/b are 50/50 (H = ln 2), yet
    the next token is fully determined by its context, so the
    conditional entropy is exactly 0 — the template-corpus signature
    the operator exists to expose."""
    from hbase_gis_spark.operators.textstats import token_entropy_rate

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id bigint, text string"
    )
    r = token_entropy_rate(df).collect()[0]
    assert (r.n_tokens, r.vocab, r.n_bigrams, r.bigram_vocab) == (6, 2, 4, 2)
    assert r.h_unigram_milli == 693  # round(1000 * ln 2)
    assert r.h_cond_milli == 0
