"""Data-quality rules: one-pass checks, violation routing, uniqueness,
referential containment."""

from __future__ import annotations

from lightlane_spark.operators.quality import (
    assert_contained,
    assert_unique,
    check,
    in_range,
    in_set,
    matches,
    not_null,
    violations,
)
from lightlane_spark.sources.parquet import read_table


def test_one_pass_checks(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, -5.0), (3, "c", 200.0), (None, "x", 50.0)],
        "id: bigint, name: string, v: double",
    )
    rules = [not_null("id"), not_null("name"), in_range("v", 0, 100)]
    counts = check(df, rules)
    assert counts == {"not_null_id": 1, "not_null_name": 1, "range_v": 2}


def test_violation_rows_annotated(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, None), (None, None)], "id: bigint, name: string"
    )
    v = violations(df, [not_null("id"), not_null("name")]).collect()
    by_id = {r.id: set(r.failed_rules) for r in v}
    assert by_id == {2: {"not_null_name"}, None: {"not_null_id", "not_null_name"}}


def test_set_and_regex_rules(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    counts = check(
        orders,
        [
            in_set("o_orderstatus", ["O", "F", "P"]),
            matches("o_orderpriority", r"^\d-"),
        ],
    )
    assert counts["set_o_orderstatus"] == 0  # clean synthetic data


def test_uniqueness_and_containment(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    customer = read_table(spark, sf_dir, "customer")
    assert assert_unique(orders, ["o_orderkey"]).count() == 0
    assert assert_unique(lineitem, ["l_orderkey"]).count() > 0  # multi-line orders
    # every order's customer exists
    assert (
        assert_contained(orders, customer, ["o_custkey"], ["c_custkey"]).count() == 0
    )
    # planted orphan is caught
    orphan = spark.createDataFrame([(999999,)], "o_custkey: bigint")
    bad = orders.select("o_custkey").unionByName(orphan)
    assert assert_contained(bad, customer, ["o_custkey"], ["c_custkey"]).count() == 1


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL++ (rsd=2%) must land within ±5% of exact per-group distinct
    counts on real data — the contract backing the rows-only driver
    query `approx_distinct`."""
    from pyspark.sql import functions as F

    from lightlane_spark.sources.parquet import read_table

    ev = read_table(spark, sf_dir, "events")
    got = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert got
    for r in got:
        assert abs(r.approx - r.exact) <= max(0.05 * r.exact, 2)


def test_star_contraction_hub_graph(spark):
    """The window-form large/small-star (r8 rewrite: the collect_set
    form was O(degree²) on hot nodes) must label a 1k-degree hub star
    graph + attached chain identically to union-find, through the
    DISTRIBUTED path."""
    from pyspark.sql import functions as F

    from lightlane_spark.operators.clustering import connected_components

    hub = spark.range(1, 1001).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )
    # chain attached to node 1000: 1000-2000
    chain = spark.range(1000, 2000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    # separate 3-cycle component: 5000-5001-5002-5000
    cyc = spark.createDataFrame(
        [(5000, 5001), (5001, 5002), (5000, 5002)], "id_a bigint, id_b bigint"
    )
    edges = hub.unionByName(chain).unionByName(cyc)
    cc = connected_components(edges, driver_edge_cap=None)
    comp = {r.id: r.component for r in cc.collect()}
    assert comp[0] == 0 and comp[500] == 0 and comp[2000] == 0
    assert comp[5000] == 5000 and comp[5001] == 5000 and comp[5002] == 5000
    assert len(comp) == 2001 + 3


def test_symmetrize_multiset_semantics(spark):
    """symmetrize emits exactly one (u,v) and one (v,u) row per input
    ROW (union-all multiset semantics, including duplicates and
    self-loops passed through) — the in-row form must match the
    e UNION ALL e.swap contract it replaced."""
    from lightlane_spark.operators.clustering import symmetrize

    df = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 3), (4, 5)], "u bigint, v bigint"
    )
    got = sorted(map(tuple, symmetrize(df).collect()))
    assert got == sorted(
        [(1, 2), (2, 1), (1, 2), (2, 1), (3, 3), (3, 3), (4, 5), (5, 4)]
    )
