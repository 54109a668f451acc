"""OP-06/07/08/11/12 — extract-side operators vs DuckDB oracle."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from lightlane_spark.operators.extract import (
    exclude_columns,
    min_max,
    range_partitioned_read,
    schema_of,
    select_columns,
    split_ranges,
    with_filter,
)
from lightlane_spark.sources.parquet import read_table, table_path


def test_projection_and_filter(spark, sf_dir):
    df = read_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"], where="l_quantity > 30"
    )
    got = df.count()
    exp = duckdb.sql(
        f"SELECT count(*) FROM '{table_path(sf_dir, 'lineitem')}' WHERE l_quantity > 30"
    ).fetchone()[0]
    assert got == exp
    assert df.columns == ["l_orderkey", "l_quantity"]


def test_column_exclusion(spark, sf_dir):
    df = read_table(spark, sf_dir, "orders", exclude=["o_orderpriority", "o_orderstatus"])
    assert "o_orderpriority" not in df.columns and "o_orderkey" in df.columns
    assert schema_of(read_table(spark, sf_dir, "orders"), exclude=["o_custkey"]) == [
        c for c in read_table(spark, sf_dir, "orders").columns if c != "o_custkey"
    ]


def test_min_max_probe(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem")
    lo, hi = min_max(df, "l_orderkey")
    exp = duckdb.sql(
        f"SELECT min(l_orderkey), max(l_orderkey) FROM '{table_path(sf_dir, 'lineitem')}'"
    ).fetchone()
    assert (lo, hi) == exp


def test_min_max_all_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "k: bigint")
    assert min_max(df, "k") == (None, None)


@pytest.mark.parametrize("splits", [1, 2, 3, 7])
def test_range_split_lossless(spark, sf_dir, splits):
    """Union of per-range scans == full scan; no dup/loss at boundaries
    (closed last range, reference sql.py:144-148)."""
    df = read_table(spark, sf_dir, "lineitem")
    split = range_partitioned_read(df, "l_orderkey", splits)
    assert split.count() == df.count()
    assert split.select("l_orderkey").distinct().count() == df.select(
        "l_orderkey"
    ).distinct().count()


def test_range_split_serial_fallback(spark):
    df = spark.createDataFrame([(None, 1.0), (None, 2.0)], "k: bigint, v: double")
    out = range_partitioned_read(df, "k", 4)
    assert out.count() == 2  # serial fallback keeps NULL-key rows


def test_split_ranges_int_remainder():
    rs = split_ranges(0, 10, 3)  # 10//3=3 → [0,3),[3,6),[6,9),[9,10]
    assert rs == [(0, 3), (3, 6), (6, 9), (9, 10)]


def test_split_ranges_date_and_datetime():
    d0, d1 = dt.date(2025, 1, 1), dt.date(2025, 1, 11)
    rs = split_ranges(d0, d1, 2)
    assert rs[0] == (d0, dt.date(2025, 1, 6)) and rs[-1][1] == d1
    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2025, 1, 1, 0, 0, 10)
    assert split_ranges(t0, t1, 5)[1] == (
        dt.datetime(2025, 1, 1, 0, 0, 2),
        dt.datetime(2025, 1, 1, 0, 0, 4),
    )


def test_with_filter_and_select_passthrough(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem")
    assert with_filter(df, None) is df
    assert select_columns(df, "*") is df
    assert exclude_columns(df, None) is df
