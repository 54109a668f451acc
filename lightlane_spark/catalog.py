"""Catalog / DDL utilities — OP-10, OP-28, OP-29, OP-32.

Reference parity:
  - OP-10 existence probe: ``SHOW TABLES LIKE`` + optional ``USE db``
    (``connector/dbapi.py:141-147``) → ``spark.catalog.tableExists``.
  - OP-28 create-if-missing: run user DDL when the target is absent
    (``hive_loader.py:106-110``, ``mysql_loader.py:75-79``).
  - OP-29 staging DDL (``CREATE TABLE LIKE`` / schema-only CTAS
    ``LIMIT 0``, ``hive_loader.py:112-124``): a transient DataFrame
    needs no staging DDL; ``schema_only`` gives the LIMIT-0 clone when
    an empty frame with the target schema is wanted.
  - OP-32 stats refresh: ``INVALIDATE METADATA`` + ``COMPUTE
    INCREMENTAL STATS`` (``hive_impala.py:49-58``) → ``ANALYZE TABLE
    … COMPUTE STATISTICS [FOR COLUMNS]`` + ``REFRESH TABLE`` — feeds
    Spark's CBO exactly as Impala's stats feed its planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_exists(spark: SparkSession, table: str, database: str | None = None) -> bool:
    """OP-10: catalog existence probe."""
    name = f"{database}.{table}" if database else table
    return spark.catalog.tableExists(name)


def create_table_if_missing(
    spark: SparkSession, table: str, ddl: str | None = None, database: str | None = None
) -> bool:
    """OP-28: run user DDL iff the target is absent. Returns True when
    the table was created. No DDL and absent → error, matching the
    reference's failure mode (it would fail on the subsequent load)."""
    if table_exists(spark, table, database):
        return False
    if not ddl:
        raise ValueError(f"table {table} is missing and no create_table_ddl given")
    spark.sql(ddl)
    return True


def schema_only(df: DataFrame) -> DataFrame:
    """OP-29: the reference's schema-only CTAS (``SELECT … LIMIT 0``)."""
    return df.limit(0)


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """OP-32: refresh metadata + compute stats for the CBO."""
    spark.sql(f"REFRESH TABLE {table}")
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")


def row_count_stat(spark: SparkSession, table: str) -> int | None:
    """Planner-visible row count after ``analyze_table`` (None if no
    stats) — the observable effect OP-32 exists for."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    for r in rows:
        if r.col_name == "Statistics":
            for part in r.data_type.split(","):
                part = part.strip()
                if part.endswith("rows"):
                    return int(part.split()[0])
    return None
