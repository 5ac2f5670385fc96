"""Similarity search tests: exact top-k vs numpy, LSH recall."""

import numpy as np
import pytest

from hbase_gis_spark.operators.similarity import ann_lsh_topk, cosine_topk
from hbase_gis_spark.sources.tables import load_table
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF0001, "embeddings").cache()


def test_cosine_topk_matches_numpy(emb):
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items()
        if vid != 0
    }
    expect = sorted(sims, key=lambda vid: (-sims[vid], vid))[:10]
    got = [r.vec_id for r in cosine_topk(emb, 0, 10).collect()]
    assert got == expect


def test_ann_lsh_recall(emb):
    """Hyperplane-LSH with hamming<=2 probing should recover most of
    the exact top-10 (recall >= 0.6 on this data; exact rerank means
    precision is 1 on whatever it returns)."""
    exact = [r.vec_id for r in cosine_topk(emb, 0, 10).collect()]
    approx = [r.vec_id for r in ann_lsh_topk(emb, 0, 10).collect()]
    assert len(set(approx) & set(exact)) >= 6
    assert len(approx) <= 10
