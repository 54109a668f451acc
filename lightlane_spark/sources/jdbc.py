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
                 properties: dict[str, str] | None = None):
    """OP-11 over JDBC: one-aggregate min/max probe for split bounds."""
    q = f"SELECT MIN({splitby}) AS lo, MAX({splitby}) AS hi FROM {table}"
    row = read_jdbc(spark, url, query=q, properties=properties).first()
    return (row["lo"], row["hi"])


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """OP-22: bulk load replacement — batched INSERTs from executors
    (the reference's ``LOAD DATA LOCAL INFILE``, ``mysql.py:39-64``,
    collapses into the JDBC writer; per-partition connections give the
    same parallelism as its worker pool)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
