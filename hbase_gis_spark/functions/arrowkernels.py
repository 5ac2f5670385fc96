"""Arrow-batched fold-exact kernels (no ``from __future__ import
annotations`` here — pandas_udf type-hint inference needs live
``pd.Series`` annotations, not stringified ones).

See operators/similarity.py ("fold-exact Arrow kernels") for the
bit-exactness contract: per-dimension SEQUENTIAL float64 accumulation
reproduces the interpreted HOF fold (and the DuckDB list_sum oracles)
bit-for-bit, while running vectorized over Arrow batches.
"""

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


def _as_f64(series: pd.Series) -> np.ndarray:
    # a 0-row Arrow batch yields shape (0,) from tolist() — reshape so
    # the per-dim accumulation loops are safely skipped
    V = np.array(series.tolist(), dtype=np.float64)
    if V.ndim == 1:
        V = V.reshape(len(series), 0)
    return V


def _seq_matdots(V: np.ndarray, M: np.ndarray) -> np.ndarray:
    """(n,d)·(p,d)ᵀ accumulated dim-sequentially (fold order)."""
    acc = np.zeros((V.shape[0], M.shape[0]))
    for j in range(V.shape[1]):
        acc += V[:, j : j + 1] * M[:, j][None, :]
    return acc


def _seq_pairdots(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    acc = np.zeros(A.shape[0])
    for j in range(A.shape[1]):
        acc += A[:, j] * B[:, j]
    return acc


def fold_dots(vec_col: Column, M) -> Column:
    """array<float> → array<double> of dots with each row of ``M``,
    bit-identical to ``[dot_expr(v, m) for m in M]``."""
    Md = np.asarray(M, dtype=np.float64)

    @pandas_udf("array<double>")
    def _dots(s: pd.Series) -> pd.Series:
        return pd.Series(list(_seq_matdots(_as_f64(s), Md)))

    return _dots(vec_col)


def pair_cosine(a_col: Column, b_col: Column) -> Column:
    """Exact cosine of two vector columns, bit-identical to
    ``cosine_expr`` (dot/(sqrt(aa)·sqrt(bb)), fold order)."""

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A, B = _as_f64(a), _as_f64(b)
        d = _seq_pairdots(A, B)
        return pd.Series(
            d / (np.sqrt(_seq_pairdots(A, A)) * np.sqrt(_seq_pairdots(B, B)))
        )

    return _cos(a_col, b_col)


def minhash_mins(
    h32_col: Column, num_hashes: int, a0: int, b0: int, p: int
) -> Column:
    """MinHash signature from a 32-bit shingle-hash array: permutation
    i's value is min over shingles of (a_i*h + b_i) % p, with
    a_i = 2i + a0, b_i = 7i + b0 — integer arithmetic only (a_i*h <
    2^53 << 2^63), so the numpy result is exactly the HOF expression's.
    An empty shingle array yields all-null (array_min of empty = null),
    matching the expression twin element-for-element."""
    A = np.arange(num_hashes, dtype=np.int64) * 2 + a0
    B = np.arange(num_hashes, dtype=np.int64) * 7 + b0

    @pandas_udf("array<bigint>")
    def _mh(s: pd.Series) -> pd.Series:
        nulls = [None] * num_hashes
        out = []
        for h in s:
            H = np.asarray(h, dtype=np.int64)
            if H.size == 0:
                out.append(nulls)
                continue
            out.append(((A[:, None] * H[None, :] + B[:, None]) % p).min(axis=1))
        return pd.Series(out)

    return _mh(h32_col)
