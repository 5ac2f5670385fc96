"""Scale-safe EXACT global ranking: range shards + per-shard ranks +
a bounded driver prefix, never a single-task global sort.

The classic scale-killer is ``row_number() OVER (ORDER BY v)`` — one
task sorts the whole table. Every helper here replaces that shape
with the machinery drift.global_quantile_cuts introduced (VERDICT r4
next-round #2): the order-column domain is split into ``n_shards``
ordered, DISJOINT value ranges (equal keys land in one shard), each
shard ranks locally in parallel, and the true global rank is the
local rank plus the prefix-sum of earlier shards' row counts — a
driver-side prefix over ``n_shards`` integers, constant in table
size (the token_budget_sample bounded-collect pattern).

Consumers: :func:`sharded_ntile` (rfm_segments, balance_deciles),
:func:`global_percentiles` (sketch_stats, mad_anomalies),
:func:`global_half_ranks` (spearman_corr, shuffle_audit), and
:func:`quantile_transform` — all previously global single-task
``Window.orderBy`` windows, now banned repo-wide by the AST check in
tests/test_plan_hygiene.py.

Determinism & fault tolerance (VERDICT r5 next-round #2): shard ids
derive from BOUNDARY LITERALS baked into the plan — n_shards-1 cut
values collected ONCE driver-side (a single bounded
``approxQuantile`` sketch pass) and frozen as plan constants. A
retried task re-evaluates ``value vs literals`` and lands every row
in the same shard, so no pinning materialization is needed: the old
implementation pinned a nondeterministic ``spark_partition_id()``
with an eager ``localCheckpoint()``, which truncated lineage (a lost
executor killed the job instead of recomputing) and double-stored a
fact-table-sized frame. Output VALUES are boundary-independent —
offsets correct every shard's ranks to the same global ranks
regardless of where the cuts fall — so balance (not correctness)
is all the sketch accuracy buys.

Tie-mass skew contract: equal keys MUST share a shard (the tie-count
identity in :func:`global_half_ranks` needs it), so a heavily
quantized or near-constant order column funnels its tie mass into
one shard and degenerates back toward a single-task sort. The
bounded shard-size collect doubles as the guard: when the fattest
shard holds more than ``max(25%, 4/n_shards)`` of the rows a
``RuntimeWarning`` names the column and the fraction (pinned in
tests/test_round5_ops.py). The fix at that point is upstream —
rank a finer quantization or add a tiebreak column.

Overflow bound: boundary literals are chosen via a double-precision
sketch, so integral order columns beyond 2**53 could see cast
round-trips disagree with native ordering near a cut. Ranked columns
in this repo are milli/cent units << 2**53; the guard is documented
here rather than paid for per row.

Persist/release policy (ADVICE r11 #4): operator-level persists across
the repo (the ``cache=True`` knobs here and in drift.py, plus the
always-on narrow persists in dedup/similarity/textstats) are
lineage-kept MEMORY_AND_DISK frames that the operator cannot unpersist
itself — the returned DataFrame still reads them lazily. Release is
the caller's session lifecycle: ``spark.catalog.clearCache()`` between
units of work (bench.py does this before every timed query), or the
ContextCleaner when the frames are GC'd. Long-lived sessions composing
many operators should clear between pipelines.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def shard_boundaries(
    df: DataFrame, col: str, n_shards: int
) -> list[int | float]:
    """n_shards-1 ascending, deduplicated cut values for ``col``,
    collected once (bounded Greenwald-Khanna sketch pass — O(1/err)
    driver memory, never O(rows)) and intended to be frozen into the
    plan as literals. Integral columns get integral boundaries
    (floor) so shard comparison happens in the column's native type
    — no double-cast ordering disagreement."""
    if n_shards <= 1:
        return []
    dtype = dict(df.dtypes)[col]
    probs = [i / n_shards for i in range(1, n_shards)]
    err = max(0.001, 0.25 / n_shards)
    raw = (
        df.select(F.col(col).cast("double").alias("__aq"))
        .filter(F.col("__aq").isNotNull() & ~F.isnan("__aq"))
        .stat.approxQuantile("__aq", probs, err)
    )
    vals = [b for b in raw if b == b]  # drop NaN defensively
    if dtype in _INTEGRAL_TYPES:
        vals = [int(b // 1) for b in vals]
    return sorted(set(vals))


def _sql_literal(v) -> str | None:
    """Exact SQL rendering of an int/float boundary literal, or None
    when the value needs the Column API (non-numeric). Floats render
    via ``DOUBLE('<repr>')``: repr round-trips every double exactly
    (incl. inf) and the quoted form parses as DOUBLE, never DECIMAL."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return f"DOUBLE('{v!r}')"
    return None


def apply_range_shards(
    df: DataFrame,
    key: str,
    bounds: list,
    shard_col: str = "__shard",
) -> DataFrame:
    """Attach the DETERMINISTIC shard id (= how many boundary literals
    the row's key exceeds — retry-safe, no materialization) as
    ``shard_col``. NULL keys compare NULL against every boundary and
    land in shard 0, matching ASC NULLS FIRST window order; NaN
    compares greater than every boundary (Spark NaN ordering) and
    lands in the last shard, matching NaN-sorts-last.

    Built as ONE SQL expression string (optimization r12): the former
    chained-``F.when`` construction issued ~4 py4j calls per boundary
    — ~0.8-1.1 s of pure driver time per call at n_shards=64, paid by
    EVERY rank consumer (guide §1.2: the planning edge must be cheap,
    not just bounded). ``IF(key > b, 1, 0)`` is the identical
    expression (NULL condition → 0, same NaN/type coercions)."""
    lits = [_sql_literal(b) for b in bounds]
    if bounds and all(x is not None for x in lits):
        terms = " + ".join(f"IF(`{key}` > {x}, 1, 0)" for x in lits)
        return df.withColumn(
            shard_col, F.expr(f"CAST(({terms}) AS INT)")
        )
    shard = F.lit(0)
    for b in bounds:
        shard = shard + F.when(F.col(key) > F.lit(b), 1).otherwise(0)
    return df.withColumn(shard_col, shard.cast("int"))


def warn_tie_mass(
    sizes: dict[int, int],
    key: str,
    n_bounds: int,
    n_shards: int,
) -> int:
    """Raise the tie-mass skew ``RuntimeWarning`` when one shard holds
    > max(25%, 4/n_shards) of the rows AND far above the ideal share
    (the module-header contract: equal keys cannot split). Returns the
    total row count. Shared by the offsets helpers and callers that
    consume raw size maps directly."""
    total = sum(sizes.values())
    if total and len(sizes) >= 1 and n_shards > 1:
        max_size = max(sizes.values())
        max_frac = max_size / total
        n_eff = n_bounds + 1
        # skew = fattest shard far above the IDEAL ceil(total/n_shards)
        # AND a dominant fraction — the absolute leg keeps tiny frames
        # (where even perfect balance is a big fraction) quiet
        ideal = -(-total // n_shards)
        if max_frac > max(0.25, 4.0 / n_shards) and max_size > 4 * ideal:
            warnings.warn(
                f"range_sharded tie-mass skew on {key!r}: fattest shard "
                f"holds {max_frac:.0%} of {total} rows across {n_eff} "
                "effective shards (equal keys cannot split). Rank a "
                "finer quantization or add a tiebreak column.",
                RuntimeWarning,
                stacklevel=5,
            )
    return total


def _offsets_from_sizes(
    spark,
    sizes: dict[int, int],
    key: str,
    n_bounds: int,
    n_shards: int,
    shard_col: str = "__shard",
) -> tuple[DataFrame, int]:
    """Shared driver-side tail of :func:`shard_offsets` /
    :func:`shard_offsets_multi`: tie-mass skew warning + prefix-sum
    offsets frame from a per-shard size map."""
    total = warn_tie_mass(sizes, key, n_bounds, n_shards)
    offsets, acc = [], 0
    for sid in sorted(sizes):
        offsets.append((int(sid), int(acc)))
        acc += sizes[sid]
    odf = spark.createDataFrame(
        offsets or [(0, 0)], f"{shard_col} int, __off bigint"
    )
    return odf, total


def shard_offsets(
    sharded: DataFrame,
    key: str,
    n_bounds: int,
    n_shards: int,
    shard_col: str = "__shard",
) -> tuple[DataFrame, int]:
    """Bounded collect of per-shard sizes (one integer per shard —
    never grows with data; recomputable, so losing an executor
    replays lineage instead of killing the job): returns the
    (shard, prefix-offset) frame and the total row count, and raises
    the tie-mass skew RuntimeWarning when one shard holds
    > max(25%, 4/n_shards) of the rows."""
    sizes = {
        r[shard_col]: r["cnt"]
        for r in sharded.groupBy(shard_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    return _offsets_from_sizes(
        sharded.sparkSession, sizes, key, n_bounds, n_shards, shard_col
    )


def shard_boundaries_multi(
    df: DataFrame, cols: list[str], n_shards: int
) -> dict[str, list]:
    """:func:`shard_boundaries` for SEVERAL columns in ONE bounded
    sketch pass (optimization r11; guide §1.2 — the per-call eager
    sketch job was the dominant build cost of multi-metric rank
    consumers). ``approxQuantile`` computes each column independently
    with the same Greenwald–Khanna sketch and error, so the per-column
    cuts are identical to ``shard_boundaries(df, col, n_shards)``
    (pinned by tests/test_rank_property.py).

    NaN and null values are excluded per column inside the combined
    projection (NaN → null, and nulls are ignored by the sketch), so
    the cuts match the single-column helper for all inputs — the old
    "caller must pre-filter NaN" contract is gone (ADVICE r11 #3)."""
    if n_shards <= 1:
        return {c: [] for c in cols}
    dtypes = dict(df.dtypes)
    probs = [i / n_shards for i in range(1, n_shards)]
    err = max(0.001, 0.25 / n_shards)
    # NaN-proofing (ADVICE r11 #3): null-out NaN per floating column in
    # the projection itself — nulls are ignored by the sketch, so the
    # batched cuts match the single-column helper (which pre-filters
    # NaN per column) for ALL inputs, not just pre-filtered callers.
    # Integral/decimal columns cannot hold NaN; skip the branch there.
    def _clean(c: str, i: int):
        e = F.col(c).cast("double")
        if dtypes[c] in ("float", "double"):
            e = F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(e)
        return e.alias(f"__aq{i}")

    proj = df.select(*[_clean(c, i) for i, c in enumerate(cols)])
    raws = proj.stat.approxQuantile(
        [f"__aq{i}" for i in range(len(cols))], probs, err
    )
    out: dict[str, list] = {}
    for c, raw in zip(cols, raws):
        vals = [b for b in raw if b == b]  # drop NaN defensively
        if dtypes[c] in _INTEGRAL_TYPES:
            vals = [int(b // 1) for b in vals]
        out[c] = sorted(set(vals))
    return out


def shard_size_maps_multi(
    sharded: DataFrame,
    shard_cols: list[str],
) -> list[dict[int, int]]:
    """Per-shard row counts for SEVERAL shard columns of ONE frame in
    ONE aggregate job: each shard column's rows explode to
    (which-column, shard) pairs that the map-side partial aggregate
    collapses to at most ``len(shard_cols) * n_shards`` groups before
    the exchange — the collect is bounded exactly like
    :func:`shard_offsets`. Returns one ``{shard_id: count}`` map per
    shard column, POSITIONALLY aligned with ``shard_cols`` (so
    duplicate key labels cannot collide — ADVICE r11 #1)."""
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("k"),
                F.col(sc).cast("int").alias("s"),
            )
            for i, sc in enumerate(shard_cols)
        ]
    )
    rows = (
        sharded.select(F.explode(arr).alias("e"))
        .groupBy(F.col("e.k").alias("k"), F.col("e.s").alias("s"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return [
        {r["s"]: r["cnt"] for r in rows if r["k"] == i}
        for i in range(len(shard_cols))
    ]


def shard_offsets_multi(
    sharded: DataFrame,
    specs: list[tuple[str, str, int]],
    n_shards: int,
) -> dict[str, tuple[DataFrame, int]]:
    """:func:`shard_offsets` for SEVERAL shard columns of ONE frame in
    ONE aggregate job (optimization r11): ``specs`` is a list of
    ``(key_label, shard_col, n_bounds)``. The per-key size maps,
    offsets frames, totals, and tie-mass skew warnings are identical
    to the single-key version. The result dict is keyed by key_label,
    so duplicate labels would collide silently — they raise instead
    (ADVICE r11 #1; use :func:`shard_size_maps_multi` directly when
    specs can repeat a label)."""
    labels = [key for key, _sc, _nb in specs]
    if len(set(labels)) != len(labels):
        raise ValueError(
            "shard_offsets_multi: duplicate key labels "
            f"{sorted({k for k in labels if labels.count(k) > 1})} would "
            "collide in the label-keyed result; deduplicate the specs or "
            "use shard_size_maps_multi (position-aligned) instead"
        )
    size_maps = shard_size_maps_multi(
        sharded, [sc for _key, sc, _nb in specs]
    )
    spark = sharded.sparkSession
    out: dict[str, tuple[DataFrame, int]] = {}
    for (key, shard_col, n_bounds), sizes in zip(specs, size_maps):
        out[key] = _offsets_from_sizes(
            spark, sizes, key, n_bounds, n_shards, shard_col
        )
    return out


def pair_shard_boundaries(
    df: DataFrame,
    vcol: str,
    tcol: str,
    n_shards: int,
    sample_per_shard: int = 128,
) -> list[tuple]:
    """``n_shards - 1`` ascending, deduplicated LEXICOGRAPHIC cut
    pairs for the total order ``(vcol, tcol)`` — the tie-splitting
    variant of :func:`shard_boundaries`. A single-column range shard
    cannot split equal keys (the tie-mass contract above), so an
    all-ties order column degenerates to one shard; cutting on the
    (value, tiebreak) PAIR splits the tie mass while every cut still
    respects the lexicographic order, so ``local row_number + prefix
    offset`` stays an exact global rank.

    Boundaries come from a bounded DETERMINISTIC sample (Spark's own
    RangePartitioner recipe): the ``n_shards * sample_per_shard``
    rows smallest under a hash order — a per-partition bounded heap
    (TakeOrderedAndProject), never a global sort — collected once
    driver-side (a planning edge constant in table size, the
    shard_offsets argument), sorted, and cut at even ranks. Sample
    skew only affects BALANCE, never correctness: offsets re-anchor
    every shard's ranks regardless of where the cuts fall."""
    if n_shards <= 1:
        return []
    cap = n_shards * sample_per_shard
    samp = (
        df.select(F.col(vcol).alias("__sv"), F.col(tcol).alias("__st"))
        .filter(F.col(vcol).isNotNull())
        .orderBy(
            F.xxhash64(F.col(vcol), F.col(tcol)).asc(),
            F.col(vcol).asc(),
            F.col(tcol).asc(),
        )
        .limit(cap)
        .collect()
    )
    pairs = sorted((r["__sv"], r["__st"]) for r in samp)
    if not pairs:
        return []
    cuts = []
    for i in range(1, n_shards):
        idx = (i * len(pairs)) // n_shards
        if 0 < idx < len(pairs):
            cuts.append(pairs[idx - 1])
    return sorted(set(cuts))


def apply_pair_range_shards(
    df: DataFrame,
    vkey: str,
    tkey: str,
    bounds: list[tuple],
    shard_col: str = "__shard",
) -> DataFrame:
    """Attach the deterministic shard id for the LEXICOGRAPHIC order
    ``(vkey, tkey)``: how many boundary pairs the row strictly
    exceeds under ``(v > bv) OR (v = bv AND t > bt)``. NULL
    tiebreaks never exceed an equal-value cut, matching the window's
    ASC NULLS FIRST ordering of ``tkey``. One SQL expression string
    when every cut is int/float (the apply_range_shards py4j-cost
    note); Column-API fallback otherwise."""
    lits = [(_sql_literal(bv), _sql_literal(bt)) for bv, bt in bounds]
    if bounds and all(a is not None and b is not None for a, b in lits):
        terms = " + ".join(
            f"IF(`{vkey}` > {a} OR (`{vkey}` = {a} AND `{tkey}` > {b})"
            ", 1, 0)"
            for a, b in lits
        )
        return df.withColumn(
            shard_col, F.expr(f"CAST(({terms}) AS INT)")
        )
    shard = F.lit(0)
    for bv, bt in bounds:
        gt = (F.col(vkey) > F.lit(bv)) | (
            (F.col(vkey) == F.lit(bv)) & (F.col(tkey) > F.lit(bt))
        )
        shard = shard + F.when(gt, 1).otherwise(0)
    return df.withColumn(shard_col, shard.cast("int"))


def range_sharded(
    df: DataFrame,
    order_cols: list[str],
    n_shards: int = 64,
) -> tuple[DataFrame, DataFrame, int]:
    """Shard ``df`` into ordered, disjoint ranges of
    ``order_cols[0]`` and return ``(sharded, offsets, total)``:
    ``sharded`` carries every input column plus ``__shard``
    (:func:`apply_range_shards`), ``offsets`` is a
    (``__shard``, ``__off``) frame where ``__off`` is the number of
    rows in earlier shards (:func:`shard_offsets`), and ``total`` is
    the overall row count. ``local rank + __off`` is then an exact
    global rank.

    Sharding on the FIRST order column alone is sufficient for any
    ``order_cols`` suffix: rows strictly below a cut precede every
    row above it under the full lexicographic order, and first-key
    ties (which the suffix may reorder) always share a shard."""
    key = order_cols[0]
    bounds = shard_boundaries(df, key, n_shards)
    sharded = apply_range_shards(df, key, bounds)
    odf, total = shard_offsets(sharded, key, len(bounds), n_shards)
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
    w = Window.partitionBy("__shard").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    ranked = sharded.join(F.broadcast(odf), "__shard").withColumn(
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
        .drop("__shard", "__off", "__gr")
    )


def sharded_ntiles(
    df: DataFrame,
    n: int,
    specs: list[tuple[list[str], str]],
    n_shards: int = 64,
) -> DataFrame:
    """SEVERAL :func:`sharded_ntile` scores over ONE frame with the
    planning edge batched (optimization r11): one multi-column
    boundary sketch + one multi-key shard-size aggregate replace the
    former ``2 * len(specs)`` eager driver jobs, and the per-metric
    rank windows chain in one lazy plan (no intermediate persists
    needed — nothing eager consumes the intermediates anymore).

    ``specs`` is a list of ``(order_cols, out_col)``; each metric's
    bucket is EXACTLY what ``sharded_ntile(df, n, order_cols,
    out_col)`` assigns (same boundaries, same offsets, same total,
    same ANSI NTILE arithmetic). Caller contract: the first column of
    every spec must be NaN-free (the :func:`shard_boundaries_multi`
    batch contract); each spec's ``order_cols`` must be a total order
    for deterministic output."""
    keys = [order_cols[0] for order_cols, _ in specs]
    bmap = shard_boundaries_multi(df, keys, n_shards)
    cur = df
    for i, key in enumerate(keys):
        cur = apply_range_shards(cur, key, bmap[key], f"__shard{i}")
    omap = shard_offsets_multi(
        cur,
        [(key, f"__shard{i}", len(bmap[key])) for i, key in enumerate(keys)],
        n_shards,
    )
    out = cur
    for i, (order_cols, out_col) in enumerate(specs):
        odf, total = omap[keys[i]]
        w = Window.partitionBy(f"__shard{i}").orderBy(
            *[F.col(c).asc() for c in order_cols]
        )
        out = out.join(F.broadcast(odf), f"__shard{i}").withColumn(
            "__gr", F.row_number().over(w) + F.col("__off")
        )
        q, rem = divmod(total, n)
        if q == 0:
            bucket = F.col("__gr")
        else:
            head = rem * (q + 1)
            bucket = F.when(
                F.col("__gr") <= F.lit(head),
                F.expr(f"(__gr + {q}) div {q + 1}"),
            ).otherwise(
                F.expr(f"{rem} + (__gr - {head} + {q - 1}) div {q}")
            )
        out = out.withColumn(out_col, bucket.cast("int")).drop(
            "__off", "__gr"
        )
    return out.drop(*[f"__shard{i}" for i in range(len(keys))])


def global_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: dict[str, tuple[int, int]],
    n_shards: int = 64,
    tiebreak_col: str | None = None,
    cache: bool = False,
) -> DataFrame:
    """One row holding the EXACT value at global rank
    ``ceil(num*N/den)`` for each ``name: (num, den)`` requested —
    pure rank selection, no value arithmetic, so the outputs are
    engine-exact doubles (the global_quantile_cuts convention,
    generalized from evenly spaced cuts to arbitrary fractions).
    NULL/NaN values are dropped before ranking.

    ``tiebreak_col`` (a deterministic, preferably near-unique column,
    e.g. ``xxhash64`` of the row's natural key) switches sharding to
    the lexicographic ``(value, tiebreak)`` pair so heavy tie mass in
    the value column SPLITS across shards instead of funneling into
    one (the rank.py header's tie-mass contract — theil_sen's
    all-ties slope frame was the motivating case). The selected
    values are unchanged: ties carry equal values, so the value at
    global rank k under ``(v, t)`` order IS the k-th smallest v."""
    def _cache(frame: DataFrame) -> DataFrame:
        # ``cache=True`` (optimization r12, guide §5): the narrow
        # projection feeds three bounded planning jobs plus the lazy
        # rank plan — persist computes the source scan once. Opt-in
        # (spearman_corr's knob pattern); lineage kept; released by
        # the session's ContextCleaner or clearCache.
        if not cache:
            return frame
        from pyspark import StorageLevel

        from hbase_gis_spark.operators.dedup import _spread

        return _spread(frame).persist(StorageLevel.MEMORY_AND_DISK)

    if tiebreak_col is not None:
        prepped = _cache(
            df.select(
                F.col(value_col).cast("double").alias("__v"),
                F.col(tiebreak_col).alias("__t"),
            ).filter(F.col("__v").isNotNull() & ~F.isnan("__v"))
        )
        bounds = pair_shard_boundaries(prepped, "__v", "__t", n_shards)
        sharded = apply_pair_range_shards(prepped, "__v", "__t", bounds)
        odf, total = shard_offsets(
            sharded, f"({value_col},{tiebreak_col})", len(bounds), n_shards
        )
    else:
        prepped = _cache(
            df.select(
                F.col(value_col).cast("double").alias("__v")
            ).filter(F.col("__v").isNotNull() & ~F.isnan("__v"))
        )
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
    order = [F.col("__v").asc()]
    if tiebreak_col is not None:
        # window order must match the pair cuts' lexicographic order
        order.append(F.col("__t").asc())
    w = Window.partitionBy("__shard").orderBy(*order)
    hits = (
        sharded.join(F.broadcast(odf), "__shard")
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
    w = Window.partitionBy("__shard").orderBy(F.col(col).asc())
    tie = Window.partitionBy("__shard", col)
    return sharded.join(F.broadcast(odf), "__shard").select(
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
    cache: bool = False,
) -> DataFrame:
    """Global quantile (rank) normalization of a column — the
    feature transform that maps any distribution to ~uniform [0, 1]
    before training, expressed exactly: per row
    ``pct_milli = floor(1000 * avg_rank / n)`` with average tie
    ranks. Output: (``id_col``, ``col``, pct_milli).

    Rank on an INTEGER column (round to milli units first): ranking
    raw doubles risks engine tie-order differences; ranking the
    quantized integer makes ties identical everywhere.

    Scale shape: the global_half_ranks sharded machinery — boundary
    literals, per-shard rank windows in parallel, a bounded
    n_shards-integer driver prefix, and the total row count as a plan
    LITERAL (known from the same bounded collect) — never a
    single-task global sort, no totals join."""
    narrow = df.select(id_col, col)
    if cache:
        # cache=True (optimization r12, guide §5): the (id, value)
        # projection feeds the boundary sketch, the shard-size
        # aggregate, and the per-row rank plan — persist computes the
        # source scan once. Opt-in; lineage kept; ContextCleaner or
        # clearCache releases it.
        from pyspark import StorageLevel

        from hbase_gis_spark.operators.dedup import _spread

        narrow = _spread(narrow).persist(StorageLevel.MEMORY_AND_DISK)
    sharded, odf, total = range_sharded(narrow, [col], n_shards)
    w = Window.partitionBy("__shard").orderBy(F.col(col).asc())
    tie = Window.partitionBy("__shard", col)
    hr2 = (
        (F.rank().over(w) + F.col("__off")) * 2
        + F.count(F.lit(1)).over(tie)
        - 1
    )
    return (
        sharded.join(F.broadcast(odf), "__shard")
        .select(id_col, col, hr2.alias("__hr2"))
        .select(
            id_col,
            col,
            F.expr(f"(__hr2 * 1000) div {max(1, 2 * total)}").alias(
                "pct_milli"
            ),
        )
    )
