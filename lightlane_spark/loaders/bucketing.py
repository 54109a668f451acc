"""Bucketed tables — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both
sides by the key. Pre-bucketing both tables on the join key (same
bucket count) makes the join bucket-local: Spark plans a SortMergeJoin
with NO Exchange on either side. The shuffle is paid once at write
time and amortized over every subsequent join/aggregation on that key.

This is the Spark-native equivalent of the co-location the reference
delegates to Hive's clustered tables (its merge queries run inside
Hive/Impala over managed tables, ``hive_loader.py:184-201``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table.

    ``sort_by`` the join key too: SMJ then skips the per-task sort.
    Bucket count should divide evenly into cluster parallelism and
    keep buckets under a few hundred MB at the target scale.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Plain table read — bucketing metadata rides along from the
    catalog and Catalyst uses it to elide the join shuffle."""
    return spark.table(table)
