"""Print the next round's driver-window rotation from the objective
staleness ledger (the queries() docstring's steady-state policy).

The driver's correctness harness checks exactly the FIRST 50 entries
of ``queries()``. Policy (round 11+): slots 1-N are the queries that
have NEVER earned a driver row (new additions, registry order); the
remaining slots are the queries whose LAST driver-green row is oldest
(max round r such that the key appears in CORRECTNESS_r{r}.json),
ties broken by registry order.

Usage:
    python tools/rotation_plan.py            # plan the next window
    python tools/rotation_plan.py --verify   # check the CURRENT first
                                             # 50 against the policy
                                             # (exit 1 on mismatch)

Run it at the START of a round, after the driver wrote the previous
round's CORRECTNESS_r{N-1}.json — before that lands, the prior window
still shows as unchecked and the plan double-counts it. The tool only
READS; executing a rotation is still a hand edit of the queries()
dict + test_registry_window_contract in one commit.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

WINDOW = 50


def registry_order() -> list[str]:
    """The registry keys in dict order, from the imported module —
    not a source scrape, so formatting drift can't break the tool
    (ADVICE r10: the old regex died with AttributeError on any
    reflow of the return-dict literal)."""
    import __spark_entry__ as entrymod

    keys = list(entrymod.queries())
    assert len(keys) == len(set(keys)), "registry keys must be unique"
    return keys


def last_driver_round(root: str) -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for key in json.load(open(path)):
            last[key] = max(last.get(key, 0), rnd)
    return last


def plan() -> list[tuple[str, str]]:
    """The policy window as (key, reason) pairs, length WINDOW."""
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    keys = registry_order()
    last = last_driver_round(root)
    never = [k for k in keys if k not in last]
    stale = sorted(
        (k for k in keys if k in last),
        key=lambda k: (last[k], keys.index(k)),
    )
    out = [(k, "never driver-checked (new addition)") for k in never]
    out += [
        (k, f"last driver row: round {last[k]}")
        for k in stale[: WINDOW - len(out)]
    ]
    return out[:WINDOW]


def main() -> int:
    want = plan()
    if "--verify" in sys.argv:
        got = registry_order()[:WINDOW]
        expect = [k for k, _ in want]
        if got == expect:
            print(f"ok: current first {WINDOW} match the policy window")
            return 0
        print("MISMATCH between current window and policy window:")
        for i, (g, e) in enumerate(zip(got, expect), 1):
            if g != e:
                print(f"  slot {i:2d}: current={g}  policy={e}")
        return 1
    for i, (k, why) in enumerate(want, 1):
        print(f"{i:3d}  {k:36s} {why}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
