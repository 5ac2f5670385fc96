"""Interleaved A/B: round-6 gram-WINDOW plan vs round-7 groupBy
partial-aggregate + semi-join plan for the cross-doc duplicate-gram
verdict (the span-arc de-skew trade), on BOTH a flat fixture and a
fixture with genuinely skewed gram frequency.

VERDICT r7 next-round #4: SCALE.md documents the de-skew's 1.4-1.9x
cost on flat sf data, but the win it buys — a hot gram degrading to an
AQE-splittable join partition instead of one unsplittable window sort
group — was asserted, never measured. This tool measures it on the
data the trade was made for:

- SKEWED fixture: ``pct_hot``% of docs carry the SAME 8-token
  boilerplate block repeated ``reps`` times (license header / nav bar
  shape — exactly what span dedup exists to find), so each of the 8
  rotated grams lands ~``reps * pct_hot * n_docs / 100`` postings in
  ONE window partition; the rest of each doc is corpus-unique filler.
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


def plan_window(df: DataFrame) -> DataFrame:
    """Round-6 shape (git 05692ad dedup.py:1206): cross-doc verdict as
    min/max over Window.partitionBy(gram) — a hot gram's whole
    postings list is ONE unsplittable sort group."""
    g = ngram_positions(df, "doc_id", "text", N)
    gw = Window.partitionBy("gram")
    anchors = (
        g.withColumn(
            "__dup", F.min("doc_id").over(gw) != F.max("doc_id").over(gw)
        )
        .filter(F.col("__dup"))
        .select("doc_id", "pos")
    )
    return _spans_from_anchors(anchors, "doc_id")


def plan_groupby(df: DataFrame) -> DataFrame:
    """Round-7 shape (current dup_substring_spans): groupBy(gram)
    partial aggregate (map-side combine) + left-semi join back — a hot
    gram becomes an AQE-splittable join partition."""
    g = ngram_positions(df, "doc_id", "text", N)
    dup_grams = (
        g.groupBy("gram")
        .agg(F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("gram")
    )
    anchors = g.join(dup_grams, "gram", "leftsemi").select("doc_id", "pos")
    return _spans_from_anchors(anchors, "doc_id")


def make_skewed(spark: SparkSession, n_docs: int, reps: int = 24,
                pct_hot: int = 85) -> DataFrame:
    """pct_hot% of docs: the SAME 8-token block repeated ``reps``
    times + 40 unique filler tokens; the rest all-unique."""
    boiler = " ".join(
        " ".join(f"hot{j}" for j in range(8)) for _ in range(reps)
    )
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
                    F.sequence(F.lit(1), F.lit(40 + 8 * reps)),
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


def run_once(plan, df: DataFrame) -> tuple[float, tuple]:
    t0 = time.perf_counter()
    row = plan(df).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("span_len"), F.lit(0)).alias("tok"),
    ).collect()[0]
    return time.perf_counter() - t0, (row["n"], row["tok"])


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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
        "skewed": make_skewed(spark, n_docs).cache(),
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
