"""Compare two bench artifacts per query and flag regressions.

Accepts any mix of bench_full_rNN.json (this repo's complete artifact)
and the driver's BENCH_rNN.json (whose stdout tail may be truncated —
per-query numbers are recovered by regex, so early registry entries
can be missing there). Usage:

    python tools/bench_compare.py OLD.json NEW.json [ratio]

With a single argument, OLD defaults to the frozen per-query
reference point BASELINE_perquery.json (round-6 minima for all 232
queries — VERDICT r6 #6: the r1-set-only baseline hides creep in the
other ~190):

    python tools/bench_compare.py NEW.json [ratio]

Prints queries slower than `ratio` (default 1.5) in NEW, the shared-set
totals, and entries present on only one side. Remember the machine's
documented 1.5-3x external-load swing (see the repo verify notes):
judge a regression by re-running interleaved in ONE warm JVM before
believing it.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:  # bench_full format
        return {k: float(v) for k, v in doc["queries"].items() if v >= 0}
    # driver format: JSON line lives (possibly truncated) in the tail
    tail = doc.get("tail", "")
    parsed = doc.get("parsed") or {}
    if parsed.get("queries"):
        return {k: float(v) for k, v in parsed["queries"].items() if v >= 0}
    return {
        k: float(v)
        for k, v in re.findall(r'"([a-z0-9_]+)": (-?[0-9.]+)', tail)
        if float(v) >= 0
    }


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    import pathlib

    ratio = 1.5
    if len(args) >= 2 and args[-1].replace(".", "", 1).isdigit():
        ratio = float(args.pop())
    if len(args) == 1:
        default_old = (
            pathlib.Path(__file__).resolve().parents[1]
            / "BASELINE_perquery.json"
        )
        args.insert(0, str(default_old))
    import statistics

    old, new = load(args[0]), load(args[1])
    shared = sorted(set(old) & set(new))
    print(f"shared queries: {len(shared)}  "
          f"(only-old: {len(set(old) - set(new))}, "
          f"only-new: {len(set(new) - set(old))})")
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    print(f"shared-set total: {t_old:.2f}s -> {t_new:.2f}s "
          f"({t_new / t_old:.2f}x)" if t_old else "no shared set")

    # Median per-query ratio = the uniform machine-load factor between
    # the two runs (VERDICT r9 #4: this machine's background load
    # inflates EVERY query by the same ~1.3-3x; a real regression is a
    # query whose ratio stands out FROM THE MEDIAN, not from 1.0 —
    # round 9 lost a manual quiet-window reconstruction to four
    # false >2x "regressions" that were exactly the uniform factor).
    ratios = [new[k] / old[k] for k in shared if old[k] > 0.05]
    med = statistics.median(ratios) if ratios else 1.0
    print(f"median per-query ratio: {med:.2f}x "
          f"(uniform machine-load factor between the two runs)")
    if med > ratio:
        # ADVICE r10 (medium): normalizing by the median makes a
        # UNIFORM real regression invisible — a change that slows
        # every query ~2x is absorbed into the "load factor". The
        # median exceeding the threshold is itself the signal: it is
        # EITHER machine load OR a uniform code regression, and only
        # a quiet-window re-measure can tell them apart.
        print(
            f"\n*** WARNING: the median ratio itself exceeds the "
            f"{ratio}x threshold. This is either background machine "
            f"load or a UNIFORM code regression hitting every query "
            f"— the normalization below CANNOT distinguish them. "
            f"Re-measure in a quiet window (interleaved, one warm "
            f"JVM) before trusting the load-normalized list. "
            f"Raw >={ratio}x regressions (un-normalized): "
            f"{sum(1 for r in ratios if r > ratio)}/{len(ratios)}"
        )

    regs = [
        (k, old[k], new[k])
        for k in shared
        if old[k] > 0.05 and new[k] > ratio * med * old[k]
    ]
    wins = [
        (k, old[k], new[k])
        for k in shared
        if new[k] > 0.05 and old[k] * med > ratio * new[k]
    ]
    print(f"\nregressions > {ratio}x the median ratio "
          f"(i.e. > {ratio * med:.2f}x raw): {len(regs)}")
    for k, a, b in sorted(regs, key=lambda x: -x[2] / x[1]):
        print(f"  {k:32} {a:7.3f} -> {b:7.3f}  ({b / a:.2f}x raw, "
              f"{b / a / med:.2f}x load-normalized)")
    print(f"improvements > {ratio}x the median ratio: {len(wins)}")
    for k, a, b in sorted(wins, key=lambda x: -x[1] / x[2]):
        print(f"  {k:32} {a:7.3f} -> {b:7.3f}  ({b / a:.2f}x raw, "
              f"{b / a / med:.2f}x load-normalized)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
