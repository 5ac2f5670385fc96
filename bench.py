"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect bottleneck). Results also matter at 100 TB: these are
the same code paths the driver's correctness gate checks, so the bench
measures the real operators, not simplified twins.

Timing note: the rank.py-based queries (sketch_stats, rfm_segments,
balance_deciles, spearman_value_time, global_value_cuts) execute their
bounded shard-size collect EAGERLY at DataFrame-construction time, so
the per-query wall below includes build+execute for them — the honest
total either way (ADVICE r4 #4).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hbase_gis_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm the JVM/codegen once with the cheapest query
    try:
        next(iter(qs.values()))(spark, sf_dir).limit(1).collect()
    except Exception:
        pass

    # best-of-N with INTERLEAVED rounds: this machine carries variable
    # external load (documented 1.5-3x swing), and consecutive repeats
    # of one query share any transient spike. Running round-robin
    # (q1..qN, q1..qN, ...) decorrelates the samples — a spike inflates
    # one sample of many queries instead of every sample of one — and
    # min-of-3 in one warm JVM is a stable estimate of inherent cost.
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    timings: dict[str, float] = {}
    run_totals: list[float] = []
    failed: set[str] = set()
    per_round: list[dict[str, float]] = []
    for _ in range(rounds):
        rt = 0.0
        round_t: dict[str, float] = {}
        for name, fn in qs.items():
            if name in failed:
                continue
            try:
                # Cache hygiene (measurement-bug fix, OPTIMIZATION_r12.md):
                # Spark's CacheManager substitutes ANY matching analyzed
                # subtree, so operator-internal persists from one query
                # would otherwise be read back by later queries sharing
                # the subtree and by rounds 2..N of the interleave —
                # `min` would partially measure cached reads. Clearing
                # before each timed query (outside the timed region)
                # makes every sample compute from the parquet inputs.
                # A persist INSIDE a query's own timed plan still counts
                # toward that query: that is the operator's real
                # cost/benefit.
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                rt += dt
                round_t[name] = dt
                cur = timings.get(name)
                timings[name] = dt if cur is None else min(cur, dt)
            except Exception as e:  # noqa: BLE001
                timings[name] = -1.0
                failed.add(name)
                print(f"bench error in {name}: {e}", file=sys.stderr)
        run_totals.append(round(rt, 4))
        per_round.append(round_t)
    timings = {k: round(v, 4) for k, v in timings.items()}

    total = round(sum(v for v in timings.values() if v >= 0), 4)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        # variance envelope (VERDICT r5 next-round #5): `value` is the
        # sum of per-query MINIMA across the interleaved rounds — the
        # inherent-cost estimate on a machine with 1.5-3x external load
        # swing, but systematically flattering vs any single run. The
        # per-round wall totals below expose the spread so a reader
        # (and any quoted ratio) can see what min-of-N hides.
        "n_rounds": rounds,
        "run_totals": run_totals,
        "note": (
            "value = sum of per-query min over n_rounds interleaved "
            "rounds; run_totals = each full round's wall total "
            "(min(run_totals) >= value by construction)"
        ),
    }
    # The registered query set GROWS between rounds, so the all-query
    # total is not comparable across rounds. When the round-1 bench is
    # present, also report the total over ITS query set — the
    # apples-to-apples number for "did anything regress".
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_r01.json")
        ) as f:
            r1 = json.load(f).get("parsed", {}).get("queries", {})
        common = [k for k in r1 if k in timings and timings[k] >= 0]
        if common:
            out["r1_set_total"] = round(sum(timings[k] for k in common), 4)
            out["r1_set_baseline"] = round(
                sum(r1[k] for k in common), 4
            )
            out["r1_set_n"] = len(common)
            # per-run r1-set totals: quote headline ratios from these
            # (or their min) WITH the spread, never from min-of-N alone
            out["r1_set_run_totals"] = [
                round(sum(rt.get(k, 0.0) for k in common), 4)
                for rt in per_round
            ]
    except Exception:
        pass
    # The driver's BENCH_r{N}.json stores a TRUNCATED tail of stdout, so
    # per-query numbers for early registry entries vanish from the
    # recorded artifact (VERDICT r3 next-round #2). Persist the FULL
    # per-query JSON in the repo so round-over-round comparison covers
    # every query. Round number = 1 + highest recorded driver bench, or
    # $SPARK_GRAFT_ROUND when set.
    here = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        prior = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f))
        ]
        rnd = str(max(prior, default=0) + 1)
    full_path = os.path.join(here, f"bench_full_r{int(rnd):02d}.json")
    try:
        with open(full_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as e:
        print(f"bench: could not write {full_path}: {e}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
