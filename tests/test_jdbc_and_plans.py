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


# ---------------------------------------------------------------------------
# OP-22 merge mode: the reference's server-side upsert contract
# (mysql_loader.py:92-113) — staging write + statement sequence.
# ---------------------------------------------------------------------------


def test_jdbc_merge_statement_contract():
    from lightlane_spark.sources.jdbc import jdbc_merge_statements

    stmts = jdbc_merge_statements("orders", "z_etl_orders_staging", ["o_orderkey", "o_custkey"])
    # anti-join on ALL pks, null-probe on the first (mysql_loader.py:93,103)
    insert = next(s for s in stmts if s.startswith("INSERT"))
    assert "a.o_orderkey = b.o_orderkey AND a.o_custkey = b.o_custkey" in insert
    assert "WHERE b.o_orderkey IS NULL" in insert
    assert "UNION ALL SELECT * FROM z_etl_orders_staging" in insert
    # rename dance order: retire target, install reconcile, drop bak
    renames = [s for s in stmts if s.startswith("ALTER")]
    assert renames == [
        "ALTER TABLE orders RENAME TO orders_bak",
        "ALTER TABLE z_etl_orders_reconcile RENAME TO orders",
    ]
    assert stmts[-2] == "DROP TABLE IF EXISTS orders_bak"
    assert stmts[-1] == "DROP TABLE IF EXISTS z_etl_orders_staging"


def test_jdbc_merge_requires_pks_and_executor(spark):
    from lightlane_spark.sources.jdbc import write_jdbc

    df = spark.range(3)
    with pytest.raises(ValueError, match="primary_keys"):
        write_jdbc(df, "jdbc:x", "t", mode="merge")
    with pytest.raises(ValueError, match="sql_executor"):
        write_jdbc(df, "jdbc:x", "t", mode="merge", primary_keys=["id"])


def test_jdbc_merge_end_state_against_duckdb(spark):
    """Execute the generated statements in DuckDB standing in for the
    target MySQL (one LIKE→CTAS dialect shim); the final table must be
    the anti-join+union upsert."""
    import re

    import duckdb

    from lightlane_spark.sources.jdbc import write_jdbc

    con = duckdb.connect()
    con.execute("CREATE TABLE tgt (id BIGINT, val VARCHAR)")
    con.execute("INSERT INTO tgt VALUES (1,'a'), (2,'b'), (3,'c')")

    batch = spark.createDataFrame([(2, "B2"), (4, "D")], "id bigint, val string")

    def staging_writer(df, table_name):
        rows = [(r.id, r.val) for r in df.collect()]
        con.execute(f"CREATE TABLE {table_name} (id BIGINT, val VARCHAR)")
        con.executemany(f"INSERT INTO {table_name} VALUES (?, ?)", rows)

    def sql_executor(stmts):
        for s in stmts:
            s = re.sub(
                r"CREATE TABLE (\S+) LIKE (\S+)",
                r"CREATE TABLE \1 AS SELECT * FROM \2 WHERE 1=0",
                s,
            )
            con.execute(s)

    write_jdbc(
        batch, "jdbc:unused", "tgt", mode="merge",
        primary_keys=["id"], sql_executor=sql_executor, staging_writer=staging_writer,
    )
    got = sorted(con.execute("SELECT id, val FROM tgt").fetchall())
    assert got == [(1, "a"), (2, "B2"), (3, "c"), (4, "D")]
    # staging + reconcile + bak all cleaned up
    left = {t[0] for t in con.execute("SHOW TABLES").fetchall()}
    assert left == {"tgt"}


def test_lint_plan_flags_scale_smells(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from lightlane_spark.plans.explain import lint_plan
    from lightlane_spark.sources.parquet import read_table

    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")

    # clean declarative plan → no warnings
    clean = orders.filter("o_totalprice > 1000").select("o_orderkey")
    assert lint_plan(clean) == []

    # keyless join → cartesian warning
    cart = orders.crossJoin(nation)
    assert any("CartesianProduct" in w or "NestedLoop" in w for w in lint_plan(cart))

    # row-at-a-time Python UDF → BatchEvalPython warning
    py = F.udf(lambda x: x + 1, LongType())
    slow = orders.select(py(F.col("o_orderkey")).alias("k"))
    assert any("BatchEvalPython" in w for w in lint_plan(slow))

    # multi count-distinct Expand → sketch suggestion
    md = orders.agg(
        F.countDistinct("o_orderkey"), F.countDistinct("o_custkey"),
        F.countDistinct("o_orderstatus"),
    )
    assert any("Expand" in w for w in lint_plan(md))

    # non-equi join against a small side → BroadcastNestedLoopJoin
    bnlj = orders.join(
        nation, orders["o_custkey"] > nation["n_nationkey"]
    )
    assert any("BroadcastNestedLoopJoin" in w for w in lint_plan(bnlj))

    # non-deterministic predicate → Filter present, nothing pushed to
    # any scan (must be < 1.0: Spark knows rand ∈ [0,1) and constant-
    # folds a tautological comparison away, leaving no Filter node)
    unpushed = orders.filter(F.rand(7) < 0.5).select("o_orderkey")
    assert any("PushedFilters" in w for w in lint_plan(unpushed))

    # HAVING-style filter — the ONLY Filter sits above an Aggregate,
    # nothing was pushable by construction → must NOT fire (r10
    # ADVICE #4's advisory false-positive class)
    having = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("w_sum"))
        .filter(F.col("w_sum") > 0)
    )
    assert not any("PushedFilters" in w for w in lint_plan(having))

    # ...but a raw-scan unpushed Filter STILL fires when a HAVING
    # filter coexists (the scoping must not over-suppress)
    both = (
        orders.filter(F.rand(7) < 0.5)
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("w_sum"))
        .filter(F.col("w_sum") > 0)
    )
    assert any("PushedFilters" in w for w in lint_plan(both))


def test_tree_parser_handles_catalog_qualified_scans():
    """Catalog-table scans print with dotted identifiers ("Scan
    parquet spark_catalog.default.orders"); with dots outside the
    node-name class the node dropped out of the parsed tree, and a
    Filter above it escaped the unpushed-filter rule whenever another
    (path-based) scan in the same plan parsed — the no-scan-parsed
    fallback only fires when NO scan survives parsing (r10 review
    finding, reproduced before the fix)."""
    from lightlane_spark.plans.explain import _TREE_NODE, _filter_over_raw_scan

    m = _TREE_NODE.match(
        ":  +- Scan parquet spark_catalog.default.orders (1)"
    )
    assert m and m.group(3) == "Scan parquet spark_catalog.default.orders"

    dotted_plus_plain = """== Physical Plan ==
* SortMergeJoin Inner (5)
:- * Filter (2)
:  +- Scan parquet spark_catalog.default.orders (1)
+- * Sort (4)
   +- Scan parquet  (3)
"""
    assert _filter_over_raw_scan(dotted_plus_plain)

    # the HAVING suppression must survive the broader name class
    having_only = """== Physical Plan ==
* Filter (4)
+- * HashAggregate (3)
   +- Exchange (2)
      +- Scan parquet spark_catalog.default.orders (1)
"""
    assert not _filter_over_raw_scan(having_only)


# ---------------------------------------------------------------------------
# VERDICT r4 ask #7: vendor-dialect matrix. The Derby dialect runs LIVE
# (tests/test_jdbc_live.py); this matrix pins BOTH renderings of the
# same merge dance side-by-side so a dialect regression is caught
# without a server.
# ---------------------------------------------------------------------------

_DIALECT_SHAPES = {
    "mysql": {
        # reference shape (mysql_loader.py:92-113): unquoted idents,
        # LIKE-clone, ALTER…RENAME, defensive IF EXISTS everywhere
        "n_stmts": 7,
        "create": "CREATE TABLE z_etl_orders_reconcile LIKE orders",
        "join_frag": "a.o_orderkey = b.o_orderkey AND a.o_custkey = b.o_custkey",
        "null_probe": "WHERE b.o_orderkey IS NULL",
        "rename_out": "ALTER TABLE orders RENAME TO orders_bak",
        "rename_in": "ALTER TABLE z_etl_orders_reconcile RENAME TO orders",
        "drop_tail": ["DROP TABLE IF EXISTS orders_bak",
                      "DROP TABLE IF EXISTS z_etl_orders_staging"],
    },
    "derby": {
        # ANSI shape: quoted case-sensitive idents (Spark's writer
        # creates lowercase columns Derby would fold), WITH NO DATA
        # clone, RENAME TABLE, unconditional drops (temp names only
        # ever created by this list)
        "n_stmts": 6,
        "create": "CREATE TABLE z_etl_orders_reconcile AS SELECT * FROM orders WITH NO DATA",
        "join_frag": 'a."o_orderkey" = b."o_orderkey" AND a."o_custkey" = b."o_custkey"',
        "null_probe": 'WHERE b."o_orderkey" IS NULL',
        "rename_out": "RENAME TABLE orders TO orders_bak",
        "rename_in": "RENAME TABLE z_etl_orders_reconcile TO orders",
        "drop_tail": ["DROP TABLE orders_bak",
                      "DROP TABLE z_etl_orders_staging"],
    },
}


@pytest.mark.parametrize("dialect", sorted(_DIALECT_SHAPES))
def test_jdbc_merge_dialect_matrix(dialect):
    from lightlane_spark.sources.jdbc import jdbc_merge_statements

    shape = _DIALECT_SHAPES[dialect]
    stmts = jdbc_merge_statements(
        "orders", "z_etl_orders_staging", ["o_orderkey", "o_custkey"],
        dialect=dialect,
    )
    assert len(stmts) == shape["n_stmts"], stmts
    assert shape["create"] in stmts
    insert = next(s for s in stmts if s.startswith("INSERT"))
    # the logical dance is dialect-invariant: anti-join on ALL pks,
    # null-probe on the first, UNION ALL the staging rows
    assert shape["join_frag"] in insert
    assert shape["null_probe"] in insert
    assert "UNION ALL SELECT * FROM z_etl_orders_staging" in insert
    # rename order: retire target BEFORE installing reconcile
    assert stmts.index(shape["rename_out"]) < stmts.index(shape["rename_in"])
    assert stmts[-2:] == shape["drop_tail"]


def test_jdbc_merge_unknown_dialect_rejected():
    from lightlane_spark.sources.jdbc import jdbc_merge_statements

    with pytest.raises(ValueError, match="dialect"):
        jdbc_merge_statements("t", "s", ["k"], dialect="oracle")
