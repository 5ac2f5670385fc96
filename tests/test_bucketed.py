"""Bucketed-table sink (sources/bucketed.py): the whole point is the
PHYSICAL PLAN — a join of two tables bucketed on the join key must
plan with no Exchange ON THE JOIN KEY on either side (the write paid
that shuffle once). Broadcast is disabled inside these tests: at
sf0.001 the dims are broadcast-sized, which would bypass bucketing —
at the 100 TB design point both sides are fact-sized and the
bucketed merge join is the plan that matters."""

import pytest
from pyspark.sql import functions as F

from hbase_gis_spark.sources.bucketed import (
    read_bucketed_table,
    write_bucketed_table,
)
from hbase_gis_spark.sources.tables import load_table
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    o = load_table(spark, SF0001, "orders")
    li = load_table(spark, SF0001, "lineitem")
    write_bucketed_table(o, "t_orders_b", "o_orderkey", 4)
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        4,
    )
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_no_join_key_exchange(
    spark, bucketed_pair, no_broadcast
):
    ta, tb = bucketed_pair
    a, b = read_bucketed_table(spark, ta), read_bucketed_table(spark, tb)
    joined = a.join(b, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:600]
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:900]
    # values match the unbucketed join
    o = load_table(spark, SF0001, "orders")
    li = load_table(spark, SF0001, "lineitem")
    assert joined.count() == o.join(
        li, o.o_orderkey == li.l_orderkey
    ).count() > 0


def test_bucketed_aggregation_plans_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = (
        read_bucketed_table(spark, ta)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:600]


def test_unbucketed_join_does_exchange(spark, no_broadcast):
    """Control: the same join WITHOUT bucketing shuffles both sides —
    proving the pin above is the bucketing's doing."""
    o = load_table(spark, SF0001, "orders")
    li = load_table(spark, SF0001, "lineitem")
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan, plan[:600]
