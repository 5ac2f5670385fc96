"""Similarity search tests: exact top-k vs numpy, LSH recall."""

import numpy as np
import pytest

from hbase_gis_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
)
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


def test_ann_ivf_recall(emb):
    """IVF (nlist=16, nprobe=6 ⇒ ~37% of rows scanned) recovers most of
    the exact top-10 on this near-isotropic data (measured 8/10 with the
    default deterministic seed); exact rerank means precision is 1 on
    whatever it returns."""
    exact = [r.vec_id for r in cosine_topk(emb, 0, 10).collect()]
    approx = [r.vec_id for r in ann_ivf_topk(emb, 0, 10).collect()]
    assert len(set(approx) & set(exact)) >= 6
    assert len(approx) <= 10


def test_ann_lsh_candidates_exact(emb):
    """LSH returns ≤k rows whose cosines are exact (re-ranked), all
    drawn from the hamming-≤2 signature bucket. Recall on isotropic
    64-dim noise is inherently weak (the per-plane flip probability for
    a 70° neighbor is 0.39 vs 0.5 random) — the recall gate lives on
    the IVF path above; here we pin the mechanics."""
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[0]
    approx = ann_lsh_topk(emb, 0, 10).collect()
    assert 0 < len(approx) <= 10
    for r in approx:
        v = vecs[r.vec_id]
        expect = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert abs(r.cosine - expect) < 1e-9
