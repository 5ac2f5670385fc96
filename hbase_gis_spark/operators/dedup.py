"""Deduplication operators for large-scale text/training-data pipelines.

The reference's only dedup is rowkey-collision dropping at ingest
(AbstractTestUtil.java:50-81 — first write wins). This module
generalizes that into the dedup family a 100 TB training-data pipeline
needs:

- exact dedup (hash-groupBy on a content key, first-arrival wins);
- exact n-gram Jaccard near-dup pairs (the small-scale oracle-checkable
  ground truth);
- MinHash + LSH banding (the scale path: no O(n²) pair join — candidates
  come from band-bucket equality joins, then exact verify);
- SimHash (64-bit-ish) + Hamming-ball banding.

Everything is built from JVM-side higher-order functions (split /
transform / aggregate / array_intersect): no Python in the hot path.
Hash choices are deliberate:
- md5-derived integers where a DuckDB oracle must reproduce the value
  (md5 is identical everywhere);
- xxhash64 where only Spark consumes the hash (MinHash permutations) —
  faster, codegen'd.

ANSI-mode note (Spark 4 default): all modular hash arithmetic keeps
intermediates < 2^52 (32-bit hash × ≤2^20 multiplier) so bigint
multiplication can't overflow into an ANSI error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# prime > 2^32 for MinHash permutations (a*h+b) % P with h < 2^32
_MINHASH_P = 4294967311
# deterministic permutation parameters: small odd multipliers/offsets
_MINHASH_A0, _MINHASH_B0 = 1048583, 97


def tokens(text_col) -> Column:
    """Whitespace tokenization — written identically in oracle SQL
    (regexp_split_to_array(trim(text), '\\s+'))."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def word_shingles(text_col, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM HOFs only).

    Documents with fewer than n words yield an empty set (guarded:
    Spark's sequence(1, 0) would DESCEND, not return empty)."""
    w = tokens(text_col)
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    parts = lambda i: [F.element_at(w, i + k) for k in range(n)]  # noqa: E731
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
    return F.when(
        F.size(w) >= n, F.array_distinct(sh)
    ).otherwise(F.array().cast("array<string>"))


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Exact dedup: first arrival (smallest id) per content hash.

    ``normalize=True`` lowercases and collapses whitespace first
    (near-exact dedup of formatting variants)."""
    c = F.col(text_col)
    if normalize:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    keyed = df.withColumn("__key", F.md5(c))
    w = Window.partitionBy("__key").orderBy(F.col(id_col).asc())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__key")
    )


def _jaccard(a: Column, b: Column) -> Column:
    # two empty shingle sets => 0.0, not 0/0 (ANSI mode would error)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(
        union > 0, inter.cast("double") / union.cast("double")
    ).otherwise(F.lit(0.0))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard near-duplicate pairs (id_a < id_b).

    O(n²) pair enumeration — correct at any size but only *affordable*
    for modest corpora or within blocking buckets; the 100 TB path is
    :func:`minhash_lsh_pairs`, which feeds its candidates through this
    same exact verify.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("s")
    )
    left = sh.alias("a")
    right = sh.alias("b")
    pairs = left.join(right, F.col("a.id") < F.col("b.id"))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _jaccard(F.col("a.s"), F.col("b.s")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def minhash_signature(text_col, n: int = 3, num_hashes: int = 64) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``).

    Permutation i: min over shingles of (a_i * h32(shingle) + b_i) % P,
    where h32 = xxhash64 masked to 32 bits. Entirely JVM-side HOFs:
    one xxhash per shingle, then ``num_hashes`` fused min-reductions.
    """
    sh = word_shingles(text_col, n)
    h32 = F.transform(sh, lambda s: F.xxhash64(s).bitwiseAND(F.lit(4294967295)))
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))

    def perm_min(i):
        a = i * F.lit(2) + F.lit(_MINHASH_A0)
        b = i * F.lit(7) + F.lit(_MINHASH_B0)
        return F.array_min(F.transform(h32, lambda h: (a * h + b) % F.lit(_MINHASH_P)))

    return F.transform(seeds, perm_min)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via MinHash banding — the shuffle-friendly scale path.

    rows_per_band = num_hashes / bands. Candidate pairs = documents
    agreeing on any band (equality join on (band_idx, band_hash) — a
    plain shuffled groupBy, no cartesian product), then EXACT Jaccard
    verification at ``threshold``. Output schema matches
    :func:`jaccard_pairs` so the two are interchangeable.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, n).alias("s"),
        minhash_signature(text_col, n, num_hashes).alias("sig"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice("sig", b * r + 1, r)).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    banded = base.select(
        "id", "s", F.explode(band_structs).alias("bb")
    ).select("id", "s", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a", "id_b", _jaccard(F.col("sa"), F.col("sb")).alias("jaccard")
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


# --------------------------------------------------------------- SimHash ----

_SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits signed bigint, oracle-portable


def simhash(text_col) -> Column:
    """60-bit SimHash over the word multiset (md5-derived word hashes).

    Bit j of the result is 1 iff the count of words with bit_j set
    exceeds half the word count (2*ones_j > n_words, the integer form
    of sum(bit*2-1) > 0). md5 (not xxhash) keeps it reproducible in
    DuckDB oracle SQL; all comparisons are exact integer math.
    """
    w = tokens(text_col)
    n_words = F.size(w).cast("bigint")
    hashes = F.transform(
        w, lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("bigint")
    )
    # per word: 60-element bit array (bit positions fixed at expr build time)
    bit_arrays = F.transform(
        hashes,
        lambda h: F.array(
            *[
                F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("bigint")
                for j in range(_SIMHASH_BITS)
            ]
        ),
    )
    ones = F.aggregate(
        bit_arrays,
        F.array_repeat(F.lit(0).cast("bigint"), _SIMHASH_BITS),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    packed = F.lit(0).cast("bigint")
    for j in range(_SIMHASH_BITS):
        packed = packed + F.when(
            F.element_at(ones, j + 1) * 2 > n_words, F.lit(1 << j)
        ).otherwise(F.lit(0).cast("bigint"))
    return packed


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming — EXACT, via
    pigeonhole banding: split the 60 bits into (max_hamming+1) blocks;
    any qualifying pair must agree on at least one whole block, so the
    candidate join is a plain equality shuffle, then exact popcount.
    """
    blocks = max_hamming + 1
    width = _SIMHASH_BITS // blocks
    base = df.select(F.col(id_col).alias("id"), simhash(text_col).alias("sh"))
    block_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftright(F.col("sh"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for b in range(blocks)
        ]
    )
    banded = base.select("id", "sh", F.explode(block_structs).alias("bb")).select(
        "id", "sh", F.col("bb.blk").alias("blk"), F.col("bb.key").alias("key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sha"),
            F.col("b.sh").alias("shb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sha").bitwiseXOR(F.col("shb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# -------------------------------------------------- embedding near-dup ------


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine near-duplicate pairs over an embedding column.

    Pairwise — the oracle-checkable ground truth; the scale path is
    hyperplane-LSH bucketing in operators.similarity."""
    from hbase_gis_spark.operators.similarity import cosine_expr

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )
