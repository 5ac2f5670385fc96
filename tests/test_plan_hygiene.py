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


def test_tpch_date_filters_reach_parquet_scans(spark):
    """The sargable timestamp predicates of the TPC-H-shaped queries
    must appear as PushedFilters on their parquet scans — the property
    the 100 TB scan-pruning story depends on."""
    import re

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ["pricing_summary", "shipping_priority",
                 "local_supplier_volume", "promo_revenue"]:
        plan = (
            qs[name](spark, SF0001)
            ._jdf.queryExecution().executedPlan().toString()
        )
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        assert any(
            ("LessThan" in p) or ("GreaterThan" in p) or ("l_shipdate" in p)
            or ("o_orderdate" in p)
            for p in pushed
        ), f"{name}: no date predicate pushed to any scan: {pushed}"
