"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (a single scan +
TakeOrderedAndProject — fully parallel, no shuffle of non-winners).
The scale path is random-hyperplane LSH: sign-bit signatures bucket
vectors so ANN probes touch only matching buckets.

All arithmetic is double-precision JVM HOFs (zip_with + aggregate,
sequential fold) — written to be bit-reproducible in DuckDB oracle SQL
(list_transform + list_sum over the same op order).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of the vector with ``query_id``.

    The 1-row query side is broadcast (no shuffle); ranking is
    orderBy(desc).limit(k) → per-partition heap + merge."""
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv")
    )
    return (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_expr(F.col(vec_col), F.col("__qv")).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_planes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-bit LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit i = (vec · plane_i) >= 0. Packed bigint."""
    terms = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot_expr(vec_col, lit_plane) >= 0).cast("bigint")
        terms.append(F.shiftleft(bit, i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def ann_lsh_topk(
    df: DataFrame,
    query_id: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    max_hamming: int = 2,
    dim: int = 64,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: candidates = vectors whose sign signature is
    within ``max_hamming`` bits of the query's, exactly re-ranked by
    cosine. At scale the signature is a stored/bucketed column and the
    candidate filter becomes partition pruning."""
    planes = hyperplane_planes(dim, n_planes, seed)
    sigged = df.withColumn("__sig", lsh_signature(F.col(vec_col), planes))
    q = sigged.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv"), F.col("__sig").alias("__qsig")
    )
    return (
        sigged.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .filter(
            F.bit_count(F.col("__sig").bitwiseXOR(F.col("__qsig"))) <= max_hamming
        )
        .select(
            F.col(id_col),
            cosine_expr(F.col(vec_col), F.col("__qv")).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
