"""JDBC source/sink — OP-01..OP-05, OP-12 (range-partitioned extract),
OP-22 (bulk load into MySQL-like targets).

The reference's connectors (``connector/mysql.py:17-25``,
``connector/hive_impala.py:18-47``, ``connector/dbapi.py:83-139``)
stream rows through DBAPI cursors and fan extraction out across
process workers with hand-built range predicates
(``dumper/sql.py:132-159``). Spark's JDBC source already implements
that exact design: ``partitionColumn/lowerBound/upperBound/
numPartitions`` generate the same ``k >= lo AND k < hi`` predicate
per task, executors own their connections (no pickling dance,
reference ``dbapi.py:149-151``), and ``fetchsize`` replaces the
server-side streaming cursor.

``split_options`` reproduces the reference's split semantics
(bounds probe + serial fallback) as option-dict construction, so it
is contract-testable without a live database; ``read_jdbc`` applies
them. At 100 TB the same call shape works against a sharded source —
one Spark task per range, no driver materialization.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession


def _fmt_bound(v) -> str:
    """JDBC bound options are strings; dates/datetimes use ISO forms
    (the reference stringifies the same way, ``dumper/sql.py:152-155``)."""
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def split_options(
    splitby: str | None,
    splits: int,
    lower,
    upper,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Build the partitioned-read option dict.

    Serial fallback: no split column, one split, or NULL bounds (an
    empty/all-NULL ``splitby`` column) → no partition options, a
    single query — reference ``dumper/sql.py:135-137``.
    """
    opts = {"fetchsize": str(fetchsize)}
    if not splitby or splits <= 1 or lower is None or upper is None:
        return opts
    if lower > upper:
        raise ValueError(f"lowerBound {lower!r} > upperBound {upper!r} for {splitby}")
    opts.update(
        partitionColumn=splitby,
        lowerBound=_fmt_bound(lower),
        upperBound=_fmt_bound(upper),
        numPartitions=str(splits),
    )
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    splitby: str | None = None,
    splits: int = 1,
    bounds: tuple[object, object] | None = None,
    properties: dict[str, str] | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """OP-01..OP-06: JDBC scan with optional range partitioning.

    ``table`` XOR ``query`` (arbitrary SELECT override — reference
    ``SQLDumper(query=…)``, ``dumper/sql.py:38-43``). When ``splits>1``
    and ``bounds`` not given, Spark needs them: probe first via
    ``read_jdbc(query=f"SELECT min({splitby}) lo, max({splitby}) hi
    FROM {table}")`` — one aggregate roundtrip, not the reference's
    two ORDER-BY-LIMIT-1 sorts (``dumper/sql.py:59-68``).
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    reader = spark.read.format("jdbc").option("url", url)
    if table:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    lower, upper = bounds if bounds else (None, None)
    for k, v in split_options(splitby, splits, lower, upper, fetchsize).items():
        reader = reader.option(k, v)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def probe_bounds(spark: SparkSession, url: str, table: str, splitby: str,
                 properties: dict[str, str] | None = None,
                 quote: str | None = None):
    """OP-11 over JDBC: one-aggregate min/max probe for split bounds.

    ``quote``: identifier quote character for the remote dialect —
    pass ``'"'`` for ANSI-folding engines (Derby/Postgres), where
    Spark's writer creates case-sensitive lowercase columns that an
    unquoted reference would fold to uppercase and miss; ``None``
    sends bare identifiers (MySQL-style)."""
    col = f"{quote}{splitby}{quote}" if quote else splitby
    q = f"SELECT MIN({col}) AS lo, MAX({col}) AS hi FROM {table}"
    # positional access: ANSI engines fold the unquoted aliases to
    # uppercase, so row["lo"] would miss
    row = read_jdbc(spark, url, query=q, properties=properties).first()
    return (row[0], row[1])


def jdbc_merge_statements(
    table: str,
    staging_table: str,
    primary_keys: list[str],
    dialect: str = "mysql",
) -> list[str]:
    """The reference's server-side MERGE contract
    (``mysql_loader.py:92-113``) as an ordered statement list: build a
    reconcile table holding target rows whose PK is absent from staging
    (LEFT OUTER JOIN … IS NULL = anti-join) UNION ALL staging, then
    atomically swap it in via the rename dance. Runs entirely inside
    the target DB — no data moves back through Spark.

    ``dialect="mysql"`` is the reference's exact statement shape
    (contract-tested); ``dialect="derby"`` is the same dance in ANSI/
    Derby syntax (``CREATE TABLE … AS … WITH NO DATA``, ``RENAME
    TABLE``, quoted case-sensitive identifiers, no ``IF EXISTS`` —
    the drops are unconditional because the temp names are only ever
    created by this statement list). The derby form is LIVE-tested
    against an embedded Derby endpoint (tests/test_jdbc_live.py).
    """
    if not primary_keys:
        raise ValueError("MERGE requires primary_keys")  # mysql_loader.py:49-50
    reconcile = f"z_etl_{table}_reconcile"
    bak = f"{table}_bak"
    if dialect == "derby":
        join = " AND ".join(f'a."{k}" = b."{k}"' for k in primary_keys)
        return [
            f"CREATE TABLE {reconcile} AS SELECT * FROM {table} WITH NO DATA",
            f"INSERT INTO {reconcile} "
            f"SELECT a.* FROM {table} a "
            f"LEFT OUTER JOIN {staging_table} b ON {join} "
            f'WHERE b."{primary_keys[0]}" IS NULL '
            f"UNION ALL SELECT * FROM {staging_table}",
            f"RENAME TABLE {table} TO {bak}",
            f"RENAME TABLE {reconcile} TO {table}",
            f"DROP TABLE {bak}",
            f"DROP TABLE {staging_table}",
        ]
    if dialect != "mysql":
        raise ValueError(f"unknown dialect {dialect!r}")
    join = " AND ".join(f"a.{k} = b.{k}" for k in primary_keys)
    return [
        f"DROP TABLE IF EXISTS {reconcile}",
        f"CREATE TABLE {reconcile} LIKE {table}",
        f"INSERT INTO {reconcile} "
        f"SELECT a.* FROM {table} a "
        f"LEFT OUTER JOIN {staging_table} b ON {join} "
        f"WHERE b.{primary_keys[0]} IS NULL "
        f"UNION ALL SELECT * FROM {staging_table}",
        f"ALTER TABLE {table} RENAME TO {bak}",
        f"ALTER TABLE {reconcile} RENAME TO {table}",
        f"DROP TABLE IF EXISTS {bak}",
        f"DROP TABLE IF EXISTS {staging_table}",
    ]


def jvm_sql_executor(spark: SparkSession, url: str):
    """Driver-side DDL/DML executor over the JVM's ``DriverManager`` —
    the ``sql_executor`` for ``write_jdbc(mode='merge')`` when no
    Python DBAPI driver exists for the target (embedded Derby, or any
    engine whose JDBC jar is on the Spark classpath). Statements run
    sequentially on one connection, matching the reference's
    cursor-loop (``mysql_loader.py:92-113``)."""

    def execute(statements: list[str]) -> None:
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            try:
                for s in statements:
                    st.execute(s)
            finally:
                st.close()
        finally:
            conn.close()

    return execute


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
    primary_keys: list[str] | None = None,
    sql_executor=None,
    staging_table: str | None = None,
    staging_writer=None,
    dialect: str = "mysql",
) -> None:
    """OP-22: bulk load replacement — batched INSERTs from executors
    (the reference's ``LOAD DATA LOCAL INFILE``, ``mysql.py:39-64``,
    collapses into the JDBC writer; per-partition connections give the
    same parallelism as its worker pool).

    ``mode='merge'`` adds the reference's JDBC-side upsert
    (``mysql_loader.py:92-113``): the batch lands in a staging table,
    then ``jdbc_merge_statements`` run inside the target DB via
    ``sql_executor`` (a callable taking the statement list — Spark's
    JDBC writer cannot issue DDL, so the caller supplies the
    connection; a DBAPI cursor's executescript-style loop is enough).
    ``staging_writer`` (df, table_name) -> None overrides the staging
    write for contract tests without a live endpoint.
    """
    if mode == "merge":
        if not primary_keys:
            raise ValueError("MERGE requires primary_keys")  # mysql_loader.py:49-50
        if sql_executor is None:
            raise ValueError(
                "merge mode needs sql_executor bound to the target DB "
                "(the merge runs server-side, not through the JDBC writer)"
            )
        stg = staging_table or f"z_etl_{table}_staging"
        if staging_writer is not None:
            staging_writer(df, stg)
        else:
            write_jdbc(df, url, stg, "overwrite", batchsize, properties)
        sql_executor(jdbc_merge_statements(table, stg, primary_keys, dialect=dialect))
        return
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
