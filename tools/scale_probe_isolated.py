"""Hang-proof variant of tools/scale_probe.py: each (query, sf_dir)
measurement runs in its OWN short-lived Spark subprocess under a hard
wall-clock cap, so one pathological query (or the py4j stall this
machine exhibited twice at ~20 min under load) cannot take the whole
probe down — a timeout is recorded as a finding, not a crash.

Costs one JVM startup (~25 s) per measurement; the startup is timed
separately and subtracted, so the reported seconds are query wall
only. Single-measurement mode is this same file invoked with
``--one``.

Usage:
  python tools/scale_probe_isolated.py SMALL_DIR BIG_DIR FACTOR \
      [cap_sec] [q ...]
Prints one JSON line mirroring scale_probe.py's report.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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


def run_one(name: str, sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"query": name, "sec": round(dt, 3)}))
    spark.stop()


def measure(name: str, sf_dir: str, cap_sec: int) -> float | str:
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             sf_dir],
            capture_output=True,
            text=True,
            timeout=cap_sec,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return f"timeout>{cap_sec}s"
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            return float(d["sec"])
        except Exception:  # noqa: BLE001
            continue
    return f"error: {p.stderr.strip()[-200:]}"


def main() -> int:
    if sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3])
        return 0
    small, big, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 900
    names = sys.argv[5:] or DEFAULT_QUERIES
    report = {}
    for n in names:
        s = measure(n, small, cap)
        print(f"# {n} small: {s}", file=sys.stderr, flush=True)
        b = measure(n, big, cap)
        print(f"# {n} big: {b}", file=sys.stderr, flush=True)
        row: dict = {"small_sec": s, "big_sec": b}
        if isinstance(s, float) and isinstance(b, float) and s > 0:
            row["ratio"] = round(b / s, 2)
            row["ratio_per_x"] = round(b / s / factor, 3)
        report[n] = row
    print(
        json.dumps(
            {"small": small, "big": big, "factor": factor, "cap_sec": cap,
             "queries": report}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
