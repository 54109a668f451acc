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


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Per-column data profile: (column, n_nulls, n_distinct, min_val,
    max_val) for numeric columns — the profiling depth behind stats
    refresh (OP-32; reference only triggers engine stats,
    hive_impala.py:49-58 — this computes them engine-side).

    One pass: all aggregates in a single groupBy-less agg, then an
    in-plan unpivot to rows. min/max stay numeric (string-casting them
    would make the output engine-formatting-dependent).

    ``approx`` is the 100 TB path: exact mode plans n count-distincts
    through one Expand that multiplies scan rows ×(n+1) into the
    shuffle; ``approx=True`` swaps in ``approx_count_distinct``
    (HyperLogLog++) — fixed sketch state per column, no Expand, one
    partial-agg pass. ``approx_rsd`` is the sketch's relative standard
    deviation (a σ, not a bound — size tolerance checks accordingly).
    Keep exact only when cardinality must be precise (e.g. the DuckDB
    oracle row).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    num_types = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, num_types)
        and (columns is None or f.name in columns)
    ]
    if not cols:
        raise ValueError("no numeric columns to profile")
    def ndv(col):
        return (
            F.approx_count_distinct(col, rsd=approx_rsd)
            if approx
            else F.countDistinct(col)
        )

    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__nn_{c}"),
            ndv(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    row_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_val"),
                F.col(f"__mx_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(row_structs).alias("p")).select("p.*")
