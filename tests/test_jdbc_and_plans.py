"""OP-01..OP-05/OP-12 JDBC option contracts + OP-36 plan inspection."""

from __future__ import annotations

import datetime as dt

import pytest

from lightlane_spark.plans.explain import dry_run, plan_summary
from lightlane_spark.sources.jdbc import _fmt_bound, read_jdbc, split_options
from lightlane_spark.sources.parquet import read_table


def test_split_options_partitioned():
    opts = split_options("id", 8, 7, 1_000_003)
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "7" and opts["upperBound"] == "1000003"
    assert opts["numPartitions"] == "8"


def test_split_options_serial_fallback():
    # NULL bounds → serial (reference dumper/sql.py:135-137)
    assert "partitionColumn" not in split_options("id", 8, None, None)
    assert "partitionColumn" not in split_options(None, 8, 1, 2)
    assert "partitionColumn" not in split_options("id", 1, 1, 2)


def test_bound_formatting():
    assert _fmt_bound(dt.date(2025, 3, 1)) == "2025-03-01"
    assert _fmt_bound(dt.datetime(2025, 3, 1, 4, 5, 6)) == "2025-03-01 04:05:06"
    assert _fmt_bound(42) == "42"


def test_read_jdbc_requires_table_xor_query(spark):
    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:x", table="t", query="SELECT 1")
    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:x")


def test_dry_run_returns_plan_without_executing(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem", where="l_quantity > 30")
    text = dry_run(df)
    assert "Physical Plan" in text and "Scan parquet" in text


def test_filter_and_projection_reach_the_scan(spark, sf_dir):
    """The scale contract: predicate + projection pushdown must show in
    the plan (SURVEY §4 rows 2-3)."""
    df = read_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"], where="l_quantity > 30"
    )
    ps = plan_summary(df)
    assert any("l_quantity" in f for f in ps.pushed_filters), ps.pushed_filters
    assert ps.scan_reads_only({"l_orderkey", "l_quantity"}), ps.read_schemas


def test_small_dim_join_broadcasts(spark, sf_dir):
    """customer⋈nation⋈region must pick broadcast joins, not SMJ."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    ps = plan_summary(joined)
    assert ps.broadcast_joins >= 2 and ps.sortmerge_joins == 0, ps.text[:500]
