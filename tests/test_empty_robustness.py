"""Every registered query runs cleanly over EMPTY tables.

At scale, empty inputs happen constantly — a partition-pruned scan
with no matching directories, a filter that drops everything, a new
tenant with no data yet. An operator that crashes on zero rows
(np.array([]).shape games, sequence(0, -1), division by an empty
aggregate) is a 3 a.m. page. The two IVF queries are the documented
exception: their coarse quantizer trains on a data sample, so an
empty table raises a clean ValueError instead of returning nonsense.
"""

import os

import pytest

import __spark_entry__ as entrymod
from hbase_gis_spark.sources.tables import TABLES
from tests.conftest import SF0001

# training a quantizer needs data — a clean error is the contract
NEEDS_DATA = {
    "ann_ivf_topk",
    "ivf_cells",
    "label_purity",
    "semdedup",
    "pq_adc_topk",
    "ann_ivfpq_topk",
    "ann_recall_report",
    "pca_project",
    "ivf_prototypes",
    "embedding_outliers",
    # round-8: both IVF maintenance queries train quantizers
    "ivf_reassign",
    "ivf_nprobe_curve",
    # round-10: trains the IVF quantizer AND needs the query vectors
    # present (ann_recall_report's contract)
    "retrieval_mrr",
}
# report-shaped queries emit one row per configured step/level even on
# empty input (a funnel report always has k rows, with zero counts;
# a table profile always has one row per profiled column)
FIXED_SHAPE = {
    "curation_funnel": 5,  # one row per cascade stage, zero counts
    "dedup_threshold_curve": 14,  # the threshold grid always exists
    "funnel_counts": 4,
    "table_profile": 5,
    "dataset_card": 7,
    "dedup_recall_report": 5,  # metric rows exist even over zero docs
    "profile_diff": 5,  # one row per profiled column, zero counts
    "orphan_check": 4,  # one row per audited FK relationship
    "uniqueness_audit": 3,  # one row per audited column
    "benford_revenue": 9,  # the 9-digit expectation spine always exists
    "fd_audit": 4,  # one row per audited dependency
    "naive_backtest": 2,  # one row per configured lag
    "bootstrap_means": 16,  # one row per replicate, zero sums
    "window_funnel": 4,  # one row per funnel level, zero users
    "id_gap_audit": 2,  # one row per audited key column, null span
    "forget_audit": 4,  # one row per audited table, zero counts
    "srm_check": 3,  # one row per configured arm, null expectations
    "apply_forget": 2,  # one report row per audited table, zero counts
}
# point-query operators keyed to a specific row id return empty when
# that row is absent — nothing to assert beyond "no crash"


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SF0001}/{t}.parquet").limit(0)
        # coalesce(1): keep the fixture cheap (one empty file per table)
        df.coalesce(1).write.mode("overwrite").parquet(str(base / f"{t}.parquet"))
    return str(base)


def test_all_queries_survive_empty_tables(spark, empty_dir):
    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            out = fn(spark, empty_dir)
            n = out.count()
        except ValueError:
            if name in NEEDS_DATA:
                continue  # documented: quantizer training needs rows
            failures[name] = "ValueError"
            continue
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        # global aggregates legitimately return 1 row of nulls/zeros;
        # report queries their fixed row count; everything else empty
        if n > FIXED_SHAPE.get(name, 1):
            failures[name] = f"unexpected {n} rows from empty input"
    assert failures == {}, failures
