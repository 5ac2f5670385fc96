"""Scale-safe EXACT global ranking: range shards + per-shard ranks +
a bounded driver prefix, never a single-task global sort.

The classic scale-killer is ``row_number() OVER (ORDER BY v)`` — one
task sorts the whole table. Every helper here replaces that shape
with the machinery drift.global_quantile_cuts introduced (VERDICT r4
next-round #2): ``repartitionByRange`` puts ordered, DISJOINT value
ranges on ``n_shards`` tasks (equal keys land in one shard), each
shard ranks locally in parallel, and the true global rank is the
local rank plus the prefix-sum of earlier shards' row counts — a
driver-side prefix over ``n_shards`` integers, constant in table
size (the token_budget_sample bounded-collect pattern).

Consumers: :func:`sharded_ntile` (rfm_segments, balance_deciles),
:func:`global_percentiles` (sketch_stats), and
:func:`global_half_ranks` (spearman_corr) — all previously global
single-task ``Window.orderBy`` windows, now banned repo-wide by the
AST check in tests/test_plan_hygiene.py.

Determinism note: the eager ``localCheckpoint`` is load-bearing, not
an optimization. ``spark_partition_id()`` is nondeterministic per
evaluation and every helper consumes the sharded frame TWICE (the
bounded shard-size collect + the rank window); materializing pins
the pid column as data so both passes agree. Range-partitioner
boundary sampling may vary between runs, but output VALUES are
boundary-independent: offsets correct every shard's ranks to the
same global ranks regardless of where the boundaries fell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_sharded(
    df: DataFrame,
    order_cols: list[str],
    n_shards: int = 64,
) -> tuple[DataFrame, DataFrame, int]:
    """Shard ``df`` into ``n_shards`` ordered, disjoint ranges of
    ``order_cols`` and return ``(sharded, offsets, total)``:
    ``sharded`` carries every input column plus ``__pid`` (pinned by
    an eager localCheckpoint), ``offsets`` is an n_shards-row
    (``__pid``, ``__off``) frame where ``__off`` is the number of
    rows in earlier shards, and ``total`` is the overall row count.
    ``local rank + __off`` is then an exact global rank."""
    sharded = (
        df.repartitionByRange(n_shards, *[F.col(c).asc() for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # bounded collect: one integer per shard (never grows with data)
    sizes = {
        r["__pid"]: r["cnt"]
        for r in sharded.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(sizes.values())
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((int(pid), int(acc)))
        acc += sizes[pid]
    spark = df.sparkSession
    odf = spark.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off bigint"
    )
    return sharded, odf, total


def sharded_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[str],
    out_col: str,
    n_shards: int = 64,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order_cols)`` with no single-task
    sort. Semantics are exactly Spark/ANSI NTILE: with N rows the
    first ``N % n`` buckets hold ``N div n + 1`` rows, the rest
    ``N div n`` — derived arithmetically from the sharded global
    row_number, all integer ops, engine-exact. ``order_cols`` must be
    a total order (append a key tiebreak) for deterministic output."""
    sharded, odf, total = range_sharded(df, order_cols, n_shards)
    w = Window.partitionBy("__pid").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    ranked = sharded.join(F.broadcast(odf), "__pid").withColumn(
        "__gr", F.row_number().over(w) + F.col("__off")
    )
    q, rem = divmod(total, n)
    if q == 0:
        # fewer rows than buckets: NTILE gives row r bucket r
        bucket = F.col("__gr")
    else:
        head = rem * (q + 1)  # rows covered by the q+1-sized buckets
        bucket = F.when(
            F.col("__gr") <= F.lit(head),
            F.expr(f"(__gr + {q}) div {q + 1}"),
        ).otherwise(F.expr(f"{rem} + (__gr - {head} + {q - 1}) div {q}"))
    return (
        ranked.withColumn(out_col, bucket.cast("int"))
        .drop("__pid", "__off", "__gr")
    )


def global_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: dict[str, tuple[int, int]],
    n_shards: int = 64,
) -> DataFrame:
    """One row holding the EXACT value at global rank
    ``ceil(num*N/den)`` for each ``name: (num, den)`` requested —
    pure rank selection, no value arithmetic, so the outputs are
    engine-exact doubles (the global_quantile_cuts convention,
    generalized from evenly spaced cuts to arbitrary fractions).
    NULL/NaN values are dropped before ranking."""
    prepped = df.select(
        F.col(value_col).cast("double").alias("__v")
    ).filter(F.col("__v").isNotNull() & ~F.isnan("__v"))
    sharded, odf, total = range_sharded(prepped, ["__v"], n_shards)
    # ceil(num*N/den) as (num*N + den-1) div den: positive operands,
    # identical on Spark `div` and DuckDB `//`
    ranks = [
        (name, (num * total + den - 1) // den)
        for name, (num, den) in percentiles.items()
    ]
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        [(n_, int(r)) for n_, r in ranks], "__name string, __gr bigint"
    )
    w = Window.partitionBy("__pid").orderBy(F.col("__v").asc())
    hits = (
        sharded.join(F.broadcast(odf), "__pid")
        .select(
            (F.row_number().over(w) + F.col("__off")).alias("__gr"), "__v"
        )
        .join(F.broadcast(rdf), "__gr")
    )
    return hits.agg(
        *[
            F.max(F.when(F.col("__name") == name, F.col("__v"))).alias(name)
            for name, _ in ranks
        ]
    )


def global_half_ranks(
    df: DataFrame,
    col: str,
    id_col: str,
    n_shards: int = 64,
) -> DataFrame:
    """(id, ``2 * average rank`` of ``col``) with no single-task sort
    — the Spearman building block. Average tie rank = min_rank +
    (tie_count - 1)/2 is always whole or half, so it is carried
    DOUBLED in exact BIGINTs. Range sharding puts every tie group in
    one shard, so the per-(shard, value) count IS the global tie
    count and local ``rank()`` + shard offset IS the global min-rank."""
    sharded, odf, _ = range_sharded(df.select(id_col, col), [col], n_shards)
    w = Window.partitionBy("__pid").orderBy(F.col(col).asc())
    tie = Window.partitionBy("__pid", col)
    return sharded.join(F.broadcast(odf), "__pid").select(
        id_col,
        (
            (F.rank().over(w) + F.col("__off")) * 2
            + F.count(F.lit(1)).over(tie)
            - 1
        ).alias("__hr2"),
    )


def quantile_transform(
    df: DataFrame,
    col: str,
    id_col: str,
    n_shards: int = 64,
) -> DataFrame:
    """Global quantile (rank) normalization of a column — the
    feature transform that maps any distribution to ~uniform [0, 1]
    before training, expressed exactly: per row
    ``pct_milli = floor(1000 * avg_rank / n)`` with average tie
    ranks. Output: (``id_col``, ``col``, pct_milli).

    Rank on an INTEGER column (round to milli units first): ranking
    raw doubles risks engine tie-order differences; ranking the
    quantized integer makes ties identical everywhere.

    Scale shape: the global_half_ranks sharded machinery — range
    shards, per-shard rank windows in parallel, a bounded
    n_shards-integer driver prefix, and the total row count as a plan
    LITERAL (known from the same bounded collect) — never a
    single-task global sort, no totals join."""
    sharded, odf, total = range_sharded(
        df.select(id_col, col), [col], n_shards
    )
    w = Window.partitionBy("__pid").orderBy(F.col(col).asc())
    tie = Window.partitionBy("__pid", col)
    hr2 = (
        (F.rank().over(w) + F.col("__off")) * 2
        + F.count(F.lit(1)).over(tie)
        - 1
    )
    return (
        sharded.join(F.broadcast(odf), "__pid")
        .select(id_col, col, hr2.alias("__hr2"))
        .select(
            id_col,
            col,
            F.expr(f"(__hr2 * 1000) div {max(1, 2 * total)}").alias(
                "pct_milli"
            ),
        )
    )
