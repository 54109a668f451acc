"""Bucketed co-located joins: the join plan must contain no Exchange."""

from __future__ import annotations

import pytest

from lightlane_spark.loaders.bucketing import read_bucketed_table, write_bucketed_table
from lightlane_spark.plans.explain import plan_summary
from lightlane_spark.sources.parquet import read_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed_table(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_by=["l_orderkey"]
    )
    joined = read_bucketed_table(spark, "b_orders").join(
        read_bucketed_table(spark, "b_lineitem"),
        on=[spark.table("b_orders").o_orderkey == spark.table("b_lineitem").l_orderkey],
    )
    ps = plan_summary(joined)
    assert ps.sortmerge_joins >= 1, ps.text[:600]
    assert ps.exchanges == 0, "bucketed join must not shuffle:\n" + ps.text[:800]
    # and the result is correct
    assert joined.count() == lineitem.count()
    # non-bucketed baseline DOES shuffle — proves the assertion bites
    plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    assert plan_summary(plain).exchanges > 0
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")
