"""Every registered query's physical plan is free of scale-killers:
no CartesianProduct, no unsanctioned BroadcastNestedLoopJoin, no
row-at-a-time Python UDF (BatchEvalPython). Pandas UDFs
(ArrowEvalPython) are the approved Python path. Catches plan
regressions that row-count correctness tests cannot see."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tests.conftest import SF0001


def test_no_scale_killer_plans(spark):
    from plan_audit import audit

    flags = audit(spark, SF0001)
    assert flags == {}, f"scale-killer plan shapes: {flags}"
