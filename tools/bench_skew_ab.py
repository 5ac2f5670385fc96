"""Interleaved A/B: round-6 gram-WINDOW plan vs round-7 groupBy
partial-aggregate + semi-join plan for the cross-doc duplicate-gram
verdict (the span-arc de-skew trade), on BOTH a flat fixture and a
fixture with genuinely skewed gram frequency.

VERDICT r7 next-round #4: SCALE.md documents the de-skew's 1.4-1.9x
cost on flat sf data, but the win it buys — a hot gram degrading to an
AQE-splittable join partition instead of one unsplittable window sort
group — was asserted, never measured. This tool measures it on the
data the trade was made for:

- SKEWED fixture: ``pct_hot``% of docs carry a run of ``hot_run``
  REPEATED identical tokens (license-header / nav-bar boilerplate
  collapsed to its worst case), so every one of the ``hot_run - 7``
  gram positions per doc is the SAME single gram: ONE window
  partition holds ``(hot_run-7) * pct_hot * n_docs / 100`` rows — the
  unsplittable mega-group the de-skew was built for (at 20k docs /
  hot_run 400 that is ~6.7M rows in one task's sort). The rest of
  each doc is corpus-unique filler.
- FLAT fixture: every doc shares a 40-token block with exactly ONE
  partner doc (pairwise duplication, max gram frequency 2 — the
  no-skew baseline where the round-6 window plan is at its best).

Both plans end in the identical runs/span stages; the A/B times the
full dup_substring_spans pipeline to a count+sum action, interleaved
in one warm JVM (the only timing methodology SCALE.md trusts on this
machine), and checks the two plans' outputs agree row-for-row first.

Usage: python tools/bench_skew_ab.py [n_docs] [rounds]
Prints one JSON line with per-plan minima for both fixtures.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hbase_gis_spark.operators.dedup import ngram_positions

N = 8
MIN_LEN = 20


def _spans_from_anchors(anchors: DataFrame, id_col: str) -> DataFrame:
    runw = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    runs = anchors.withColumn(
        "__grp", F.col("pos") - F.row_number().over(runw)
    )
    return (
        runs.groupBy(id_col, "__grp")
        .agg(
            F.min("pos").cast("bigint").alias("start_pos"),
            (F.max("pos") - F.min("pos") + N)
            .cast("bigint")
            .alias("span_len"),
            F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        )
        .filter(F.col("span_len") >= MIN_LEN)
        .select(id_col, "start_pos", "span_len", "n_anchors")
    )


def plan_window(df: DataFrame, stage: str = "full") -> DataFrame:
    """Round-6 shape (git 05692ad dedup.py:1206): cross-doc verdict as
    min/max over Window.partitionBy(gram) — a hot gram's whole
    postings list is ONE unsplittable sort group. ``stage='anchors'``
    stops at the contested verdict stage (the downstream span
    assembly is IDENTICAL in both plans and would dilute the A/B)."""
    g = ngram_positions(df, "doc_id", "text", N)
    gw = Window.partitionBy("gram")
    anchors = (
        g.withColumn(
            "__dup", F.min("doc_id").over(gw) != F.max("doc_id").over(gw)
        )
        .filter(F.col("__dup"))
        .select("doc_id", "pos")
    )
    if stage == "anchors":
        return anchors
    return _spans_from_anchors(anchors, "doc_id")


def plan_groupby(df: DataFrame, stage: str = "full") -> DataFrame:
    """Round-7 shape (current dup_substring_spans): groupBy(gram)
    partial aggregate (map-side combine) + left-semi join back — a hot
    gram becomes an AQE-splittable join partition (and with a small
    dup-gram set, a broadcast probe with NO shuffle of the positions
    at all); the position stream is deliberately recomputed rather
    than persisted (the 100 TB no-double-storage rule)."""
    g = ngram_positions(df, "doc_id", "text", N)
    dup_grams = (
        g.groupBy("gram")
        .agg(F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("gram")
    )
    anchors = g.join(dup_grams, "gram", "leftsemi").select("doc_id", "pos")
    if stage == "anchors":
        return anchors
    return _spans_from_anchors(anchors, "doc_id")


def make_skewed(spark: SparkSession, n_docs: int, hot_run: int = 400,
                pct_hot: int = 85) -> DataFrame:
    """pct_hot% of docs: a run of ``hot_run`` identical tokens (every
    gram position is ONE shared gram) + 40 unique filler tokens; the
    rest all-unique."""
    boiler = " ".join("hot" for _ in range(hot_run))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 100 < pct_hot,
            F.concat_ws(
                " ",
                F.lit(boiler),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(40)),
                        lambda i: F.concat(
                            F.lit("u"), F.col("id"), F.lit("x"), i
                        ),
                    ),
                ),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(40 + hot_run)),
                    lambda i: F.concat(
                        F.lit("u"), F.col("id"), F.lit("x"), i
                    ),
                ),
            )
        )
        .alias("text"),
    )


def make_flat(spark: SparkSession, n_docs: int) -> DataFrame:
    """Every doc shares a 40-token block with exactly one partner
    (max gram document-frequency = 2) + 50 unique filler tokens."""
    partner = F.col("id") - (F.col("id") % 2)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.concat(
                        F.lit("p"), partner.cast("string"), F.lit("g"), i
                    ),
                ),
            ),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(50)),
                    lambda i: F.concat(
                        F.lit("u"), F.col("id"), F.lit("x"), i
                    ),
                ),
            ),
        ).alias("text"),
    )


def run_once(plan, df: DataFrame, stage: str = "full") -> tuple[float, tuple]:
    t0 = time.perf_counter()
    out = plan(df, stage)
    agg_col = "span_len" if stage == "full" else "pos"
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(agg_col), F.lit(0)).alias("chk"),
    ).collect()[0]
    return time.perf_counter() - t0, (row["n"], row["chk"])


def _session(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def sweep(n_docs: int, hot_run: int, cores_list: list[int],
          rounds: int = 2) -> dict:
    """Amdahl probe: the de-skew's 100-TB argument is that the window
    plan's wall-clock has an IRREDUCIBLE serial term — one task sorts
    the whole hot-gram group no matter how many cores exist — while
    the groupBy plan is parallel all the way down. Locally the window
    plan can still WIN on totals (a single in-memory sort of 17M rows
    is cheaper than the groupBy plan's second explode pass, measured
    below), so the honest demonstration is the SCALING CURVE, not one
    wall-clock: time both plans on the same skewed fixture at several
    core counts (plans interleaved inside each JVM), fit
    t(c) = s + p/c through the end points, and report each plan's
    serial seconds ``s``. The window plan's s IS the hot-group sort;
    extrapolated to a 1000-core cluster it is the job's floor, while
    the groupBy plan's floor is ~0."""
    out: dict = {"cores": {}, "n_docs": n_docs, "hot_run": hot_run}
    for cores in cores_list:
        spark = _session(cores)
        spark.sparkContext.setLogLevel("ERROR")
        df = make_skewed(spark, n_docs, hot_run=hot_run).cache()
        df.count()
        res = {"window": [], "groupby": []}
        for _ in range(rounds):
            for pname, plan in (
                ("window", plan_window),
                ("groupby", plan_groupby),
            ):
                # time the contested verdict stage only — the span
                # assembly downstream is identical in both plans
                sec, _ = run_once(plan, df, stage="anchors")
                res[pname].append(round(sec, 4))
        out["cores"][cores] = {p: min(v) for p, v in res.items()}
        spark.stop()
    lo, hi = min(cores_list), max(cores_list)
    if lo != hi:
        for p in ("window", "groupby"):
            tlo, thi = out["cores"][lo][p], out["cores"][hi][p]
            par = (tlo - thi) / (1.0 / lo - 1.0 / hi)
            serial = thi - par / hi
            out[f"{p}_parallel_sec"] = round(par, 2)
            out[f"{p}_serial_sec"] = round(serial, 2)
    return out


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
        hot_run = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
        cores = [int(c) for c in (sys.argv[4].split(",")
                                  if len(sys.argv) > 4 else [4, 16, 32])]
        print(json.dumps(sweep(n_docs, hot_run, cores)))
        return 0
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    hot_run = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixtures = {
        "skewed": make_skewed(spark, n_docs, hot_run=hot_run).cache(),
        "flat": make_flat(spark, n_docs).cache(),
    }
    for df in fixtures.values():
        df.count()  # materialize the cache outside the timings

    # output parity first: the de-skew is only a PLAN change
    for name, df in fixtures.items():
        a = plan_window(df).collect()
        b = plan_groupby(df).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)), name
    results = {f: {"window": [], "groupby": []} for f in fixtures}
    checks = {}
    for _ in range(rounds):
        for fname, df in fixtures.items():
            for pname, plan in (
                ("window", plan_window),
                ("groupby", plan_groupby),
            ):
                sec, chk = run_once(plan, df)
                results[fname][pname].append(round(sec, 4))
                checks.setdefault(fname, chk)
    out = {
        "n_docs": n_docs,
        "rounds": rounds,
        "mins": {
            f: {p: min(v) for p, v in plans.items()}
            for f, plans in results.items()
        },
        "all": results,
        "spans": {f: c[0] for f, c in checks.items()},
        "speedup_skewed_window_over_groupby": round(
            min(results["skewed"]["window"])
            / min(results["skewed"]["groupby"]),
            3,
        ),
        "cost_flat_groupby_over_window": round(
            min(results["flat"]["groupby"]) / min(results["flat"]["window"]),
            3,
        ),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
