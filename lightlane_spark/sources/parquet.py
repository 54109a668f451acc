"""Parquet table source over the testdata layout (one file per table).

Reference parity: the reference's "dataset" is a SQL table reachable
through a connector (reference ``dumper/sql.py:31-47``); here a table
is a parquet path and the scan is ``spark.read.parquet`` — Catalyst
pushes filters into row-group stats and prunes columns automatically,
which is the scan behavior the reference hand-rolled with generated
SQL (SURVEY §4 rows 2-3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Inferred-schema memo: (app_id, path, mtime_ns, size) -> StructType.
# ``spark.read.parquet`` re-infers the schema on EVERY call — a
# driver-side footer read + py4j roundtrip measured at ~100 ms per
# call at local[32] (vs ~15 ms with an explicit schema); at cluster
# scale schema inference samples footers over the object store, the
# driver-side cost §6 of the optimization guide warns about. The memo
# key carries mtime+size so a rewritten file re-infers; the VALUE is
# only the schema (never data or results), so every action still
# computes from the parquet input.
_SCHEMA_MEMO: dict = {}


def table_path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def read_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    columns: list[str] | str | None = None,
    where: str | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Scan a table with optional projection / predicate / exclusion.

    Mirrors the reference query builder's ``columns`` / ``where`` /
    ``exclude`` knobs (reference ``dumper/sql.py:31-57``,
    ``connector/dbapi.py:163-165``) as DataFrame ops so Catalyst can
    push them into the parquet scan.
    """
    # Some producers write TIMESTAMP(NANOS) parquet (e.g. the events
    # table); Spark refuses it unless nanos are surfaced as long,
    # which we then convert back to a (µs) timestamp below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin the SESSION time zone at the one entry point every query
    # shares: Spark's TimestampType is TZ-adjusted — window() buckets
    # against the session zone's 1970-01-01 origin and collect()
    # renders instants as session-zone wall clock — so on a non-UTC
    # host an UNPINNED session (the driver builds a plain
    # SparkSession; only lightlane's own session.py pins UTC) shifts
    # every emitted timestamp while the DuckDB oracle's naive
    # timestamps stay put. Measured: under TZ=America/New_York the
    # 50-query gate flipped streaming_sliding_counts' window_start by
    # the UTC offset; with this pin the gate is green under any host
    # zone. Idempotent, runtime-mutable conf; same value session.py
    # already sets for bench/tests.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = table_path(sf_dir, table)
    try:
        st = os.stat(path)
        # single-file tables only: a directory's stat does not change
        # when a contained file is overwritten in place, so dir
        # layouts always re-infer
        key = (
            (
                spark.sparkContext.applicationId,
                os.path.abspath(path),
                st.st_mtime_ns,
                st.st_size,
            )
            if os.path.isfile(path)
            else None
        )
    except OSError:
        key = None
    if key is not None and key in _SCHEMA_MEMO:
        df = spark.read.schema(_SCHEMA_MEMO[key]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            from lightlane_spark.memo import evict_stale

            evict_stale(_SCHEMA_MEMO, key[0])
            _SCHEMA_MEMO[key] = df.schema
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV — double division would lose precision on ~1e18 ns.
        # timestamp_micros yields TZ-ADJUSTED TimestampType; cast to
        # NTZ so this fallback produces the same type the native
        # parquet read yields (timestamp_ntz) — otherwise a nanos-
        # surfacing environment would re-introduce the host-zone
        # output class through every query that emits ts
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    if exclude:
        df = df.drop(*exclude)
    if columns and columns != "*":
        if isinstance(columns, str):
            columns = [c.strip() for c in columns.split(",")]
        df = df.select(*columns)
    if where:
        df = df.filter(where)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
