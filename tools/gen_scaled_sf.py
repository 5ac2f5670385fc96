"""One-off scaled-fixture generator for scale probes (VERDICT r7
next-round #5): writes a K-times-larger copy of an existing sf dir by
unioning K key-shifted copies of every table, WITHOUT inflating the
duplicate structure quadratically:

- All join keys (custkey/orderkey/partkey/suppkey/user_id/doc_id/
  vec_id/event_id) shift by ``copy * OFFSET``, so each copy is a
  self-consistent star and cross-copy joins cannot occur — row counts,
  group counts, and join fan-outs scale linearly.
- ``documents.text`` gets every 7th token (phase = copy index)
  replaced by a copy-unique token for copies > 0: within-copy near-dup
  pairs are preserved verbatim, while cross-copy 8-gram Jaccard drops
  to ~(6/7)^8 per gram, far below the dedup thresholds — so the
  near-dup pair count scales ~K, not K².
- ``embeddings.embedding`` gets deterministic per-copy Gaussian noise
  (sigma 0.8 relative, seed = copy) and renormalization for copies >
  0 — cross-copy cosines fall to ~0.6-0.8, below the 0.9-class dup
  thresholds, so the embedding-dup workload also scales ~K.
- Timestamps are left unchanged: the calendar stays the same length
  with K-times the rows per day — the realistic way a business grows,
  and the shape the per-day time-series operators are contracted on.

Plain pyarrow/pandas (no Spark); chunked writes keep memory bounded.

Usage: python tools/gen_scaled_sf.py SRC_DIR DST_DIR K
e.g.   python tools/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OFFSET = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def _shift(tbl: pa.Table, cols: list[str], k: int) -> pa.Table:
    import pyarrow.compute as pc

    for c in cols:
        idx = tbl.schema.get_field_index(c)
        shifted = pc.add(tbl.column(c), pa.scalar(k * OFFSET,
                                                  tbl.schema.field(c).type))
        tbl = tbl.set_column(idx, tbl.schema.field(c), shifted)
    return tbl


def _perturb_docs(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    out = []
    for t in texts:
        toks = t.split(" ")
        out.append(
            " ".join(
                f"c{k}x{i}" if (i + k) % 7 == 0 else tok
                for i, tok in enumerate(toks)
            )
        )
    idx = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(idx, tbl.schema.field("text"), pa.array(out))
    if "n_chars" in tbl.schema.names:
        nc = pa.array([len(t) for t in out], pa.int64())
        tbl = tbl.set_column(
            tbl.schema.get_field_index("n_chars"),
            tbl.schema.field("n_chars"),
            nc,
        )
    return tbl


def _perturb_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    V = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(k)
    V = V + 0.8 * np.linalg.norm(V, axis=1, keepdims=True) / np.sqrt(
        V.shape[1]
    ) * rng.standard_normal(V.shape)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    arr = pa.array(V.astype(np.float32).tolist(),
                   pa.list_(pa.float32()))
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        arr,
    )


def main() -> int:
    src, dst, k_copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name in COPY_AS_IS:
        pq.write_table(
            pq.read_table(f"{src}/{name}.parquet"), f"{dst}/{name}.parquet"
        )
        print(f"{name}: copied")
    for name, keys in KEY_COLS.items():
        base = pq.read_table(f"{src}/{name}.parquet")
        writer = pq.ParquetWriter(f"{dst}/{name}.parquet", base.schema)
        for k in range(k_copies):
            t = _shift(base, keys, k)
            if name == "documents":
                t = _perturb_docs(t, k)
            elif name == "embeddings":
                t = _perturb_embeddings(t, k)
            writer.write_table(t.cast(base.schema))
        writer.close()
        print(f"{name}: {base.num_rows} x {k_copies}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
