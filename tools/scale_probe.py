"""sf0.1 → sf1 scale probe for the most expensive registered queries
(VERDICT r7 next-round #5): every documented scale bound so far was
ARGUED from the plan shape but only ever measured to sf0.1; this tool
runs the named queries at two sf dirs in ONE warm JVM, interleaved,
and prints the wall-time ratio so a super-linear query has nowhere to
hide.

The big dir comes from tools/gen_scaled_sf.py (key-shifted copies with
cross-copy dup decorrelation, so join fan-outs and dup pair counts
scale linearly with the copy factor — the growth shape the linearity
claim is actually about; timestamps keep the same calendar, so per-day
frames grow in rows, not days).

Usage:
  python tools/scale_probe.py SMALL_DIR BIG_DIR FACTOR [rounds] [q ...]
  python tools/scale_probe.py /root/testdata/sf0.1 /tmp/sf1 10

Prints one JSON line: per-query {small_sec, big_sec, ratio,
ratio_per_x = ratio/FACTOR} using per-dir minima over the interleaved
rounds. ratio_per_x ~ 1 is linear scaling; >> 1 is the flag.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DEFAULT_QUERIES = [
    "dbscan",
    "bootstrap_means",
    "spearman_value_time",
    "corpus_pipeline",
    "spatial_clusters",
    "shuffle_audit",
    "rfm_segments",
    "embedding_dup_lsh",
    "lpa_communities",
    "trajectory_similarity",
]


def main() -> int:
    small, big, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    names = sys.argv[5:] or DEFAULT_QUERIES

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    assert not missing, f"unknown queries: {missing}"

    # warm codegen/IO once
    qs[names[0]](spark, small).limit(1).collect()

    mins: dict[str, dict[str, float]] = {
        n: {"small": float("inf"), "big": float("inf")} for n in names
    }
    errors: dict[str, str] = {}
    for rnd in range(rounds):
        for n in names:
            if n in errors:
                continue
            for side, d in (("small", small), ("big", big)):
                t0 = time.perf_counter()
                try:
                    qs[n](spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as e:  # noqa: BLE001
                    errors[n] = f"{side}: {type(e).__name__}: {e}"[:300]
                    print(
                        f"# ERROR r{rnd} {n} ({side}): {errors[n]}",
                        file=sys.stderr,
                    )
                    break
                dt = time.perf_counter() - t0
                mins[n][side] = min(mins[n][side], dt)
                print(
                    f"# r{rnd} {n} {side}: {dt:.1f}s", file=sys.stderr,
                    flush=True,
                )
    report = {}
    for n in names:
        if n in errors:
            report[n] = {"error": errors[n]}
            continue
        s, b = mins[n]["small"], mins[n]["big"]
        report[n] = {
            "small_sec": round(s, 3),
            "big_sec": round(b, 3),
            "ratio": round(b / s, 2),
            "ratio_per_x": round(b / s / factor, 3),
        }
    print(
        json.dumps(
            {
                "small": small,
                "big": big,
                "factor": factor,
                "rounds": rounds,
                "queries": report,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
