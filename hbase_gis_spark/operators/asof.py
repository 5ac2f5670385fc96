"""As-of join: attach to each left row the latest right row at-or-before
its timestamp, per key — the canonical event-enrichment join (trades ×
quotes, actions × latest-preceding state) that Spark has no built-in
operator for.

The reference has no joins at all (SURVEY.md §2 "explicitly absent");
this is part of the training-data/pipeline extension surface.

Spark-first implementation — NO per-row Python, no range-condition
join (a range theta-join would plan as a broadcast nested loop or a
cartesian): both sides union into one stream tagged by side, then one
window pass per key computes a running "last right payload seen", and
left rows read it off. Cost at any scale: ONE shuffle on the join key +
one sort by (ts, side) — identical to what a sort-merge join would pay,
with linear scan instead of per-row binary search. Skewed keys behave
like any window: AQE-splittable shuffle, bounded state (a single
payload struct) in the running-last frame.

At equal timestamps the right row is visible to the left row
(``l.ts >= r.ts`` semantics — matches DuckDB's ASOF JOIN, the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "left",
) -> DataFrame:
    """For each row of ``left``, the single row of ``right`` in the same
    ``on`` group with the largest ``right_ts`` <= ``left_ts``.

    Output: all ``left`` columns plus ``right``'s non-key columns
    (null-filled when no right row precedes — ``how='left'``; pass
    ``how='inner'`` to drop unmatched left rows). Column names must not
    collide (rename before joining, as with any Spark join).

    Determinism: if several right rows tie on (key, right_ts), the last
    one in the union sort order wins — make (key, right_ts) unique
    upstream (e.g. dropDuplicates) for fully deterministic output.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    r_payload_cols = [c for c in right.columns if c not in on]
    overlap = set(r_payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    r2 = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_l"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
    )
    l2 = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast(r2.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns if c not in on],
    )
    # right rows sort before left rows at the same __ts, so an
    # equal-timestamp right row is already visible: l.ts >= r.ts
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l2.unionByName(r2).withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__is_l") == 1)
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    return out.select(
        *on,
        *[F.col(c) for c in left.columns if c not in on],
        *[F.col(f"__m.{c}").alias(c) for c in r_payload_cols],
    )


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    on: list[str],
    left_ts: str,
    start_col: str,
    end_col: str,
    closed: str = "left",
) -> DataFrame:
    """Join each left row to the interval containing its timestamp,
    for per-key NON-OVERLAPPING intervals (session windows, SCD-style
    validity ranges).

    Composition, not a range theta-join: as-of to the latest interval
    start at-or-before the timestamp (one shuffle + one window pass),
    then a containment filter on the end bound — with non-overlapping
    intervals the latest-started interval is the only one that can
    contain the row, so this is exact. A generic range join in Spark
    plans as a broadcast nested loop; this stays a linear scan at any
    scale. ``closed``: 'left' ([start, end), Spark's session_window
    convention) or 'both' ([start, end])."""
    if closed not in ("left", "both"):
        raise ValueError("closed must be 'left' or 'both'")
    j = asof_join(left, intervals, on, left_ts, start_col, how="inner")
    upper = (
        F.col(left_ts) < F.col(end_col)
        if closed == "left"
        else F.col(left_ts) <= F.col(end_col)
    )
    return j.filter(upper)
