"""Graph analytics over edge lists derived from event streams.

The reference has no graph surface (its store is a point table —
SURVEY.md §2); these extend the engine the way a training-data /
product-analytics pipeline uses event graphs: ranking entities by
weighted transition structure.

Engine-exactness contract (same discipline as the integer milli-IDF in
operators/dedup.py): every rank update is BIGINT arithmetic — scaled
ranks, integer floor division (`div`) — so results are identical under
any shuffle/combine schedule AND identical between Spark and the
DuckDB oracle. The only float op is an optional final down-scale the
caller can do for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000  # ranks carried in micro-units


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    damping_milli: int = 850,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Weighted PageRank, ``iters`` fixed power iterations, all-integer
    arithmetic: ranks in micro-units (sum ~= RANK_SCALE), damping in
    milli-units.

    Update rule per iteration (floor division at every step, so both
    engines agree exactly)::

        contrib(v) = sum over in-edges (u, v, w) of
                       (rank(u) * w) div out_weight(u)
        rank'(v)   = ((1000 - d) * RANK_SCALE) div (1000 * n)
                     + (d * contrib(v)) div 1000

    Dangling mass (nodes with no out-edges) and floor-division residue
    are DROPPED, not redistributed — total rank decays by a bounded
    epsilon per iteration, which is irrelevant for ranking and keeps
    the recurrence one join + one aggregate (redistribution would add
    a global 1-row reduction per round).

    Scale shape: the rank table is (node, bigint) — tiny relative to
    the edge list, and the per-iteration cost is ONE shuffle join of
    edges against ranks on ``src`` plus ONE hash aggregate on ``dst``
    (out_weight joins are pre-merged into the edge table once, before
    the loop).  ``iters`` is a fixed small constant: each iteration is
    a driver-side loop step over DataFrames, data never leaves
    executors, and lineage stays shallow enough at 3 iterations that
    no checkpoint is needed.  Overflow: rank <= RANK_SCALE and
    rank * w needs w * 1e6 < 2**63, i.e. edge weights below ~9e12 —
    any realistic count weight.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n1 = nodes.agg(F.count(F.lit(1)).alias("__n"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # pre-merge out-degree into the edge table once; the loop then
    # only ever joins (edges+ow) against the small rank table
    ew = e.join(out_w, "src").localCheckpoint(eager=False)

    # integer floor division throughout — `div` in expr form because
    # the Python / operator on Columns goes through double
    rank = nodes.crossJoin(F.broadcast(n1)).select(
        "node", F.expr(f"{RANK_SCALE} div __n").alias("rank"), "__n"
    )
    for _ in range(iters):
        contrib = (
            ew.join(
                rank.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank * w) div ow").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        rank = (
            rank.join(contrib, "node", "left")
            .select(
                "node",
                "__n",
                F.expr(
                    f"cast(({1000 - damping_milli} * {RANK_SCALE}) "
                    f"div (1000 * __n) as bigint) "
                    f"+ ({damping_milli} * coalesce(contrib, 0)) div 1000"
                ).alias("rank"),
            )
        )
    return rank.select("node", F.col("rank").alias("rank_micro"))


def event_type_edges(
    ev: DataFrame,
    ts_col,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(from_type, to_type, weight) transition counts over per-user
    timelines — the same lead-window edge derivation as
    ``markov_transitions`` (one window pass, one hash aggregate bounded
    by |event_types|^2).  ``ts_col`` is a Column expression so callers
    pass the engine-portable timestamp projection."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col.asc(), F.col(id_col).asc())
    return (
        ev.select(
            F.col(type_col).alias("src"),
            F.lead(type_col, 1).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
