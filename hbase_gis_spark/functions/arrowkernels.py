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
    return np.array(series.tolist(), dtype=np.float64)


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
