"""Skew-handling utilities for 100 TB-scale shuffles.

First line of defense is AQE (on by default in session.py): it splits
skewed sort-merge-join partitions and coalesces small ones at runtime.
These helpers cover the cases AQE cannot fix:

  - ``salted_join``: a broadcast-ineligible join where one key holds a
    disproportionate share of BOTH sides' rows. AQE splits a skewed
    partition of one side, but every split still joins against the
    full matching partition of the other. Salting shards the hot keys
    N ways: the large side gets a deterministic per-row salt, the
    small side is replicated N× — the hot partition becomes N
    even partitions at the cost of replicating the small side.
  - ``salted_aggregate``: two-phase aggregation for hot grouping keys
    with heavy per-key state (e.g. collect/distinct-style aggregates
    where map-side partial aggregation can't compress). Phase 1
    aggregates (key, salt) shards; phase 2 combines shards. For plain
    algebraic aggs (sum/count/min/max) Spark's hash-aggregate partial
    step already achieves this — use only when the aggregate state,
    not the row count, is the bottleneck.
  - ``compact_output``: bound output file count/size so a 100 TB job
    doesn't emit millions of KB-sized files (the classic small-files
    problem for downstream readers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic per-row salt in [0, buckets): hash of ``cols``
    (default: all columns) — stable across retries, which random
    salting is not (a retried task must re-salt identically or the
    shuffle is corrupt)."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.xxhash64(*basis), F.lit(buckets)))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle sharded ``buckets`` ways.

    ``large`` is salted per-row; ``small`` is exploded ×buckets (one
    copy per salt value) — correctness: every (large-row, small-row)
    key match still meets on exactly one (key, salt) pair.

    Only ``how`` values that never emit unmatched *small*-side rows are
    valid: the small side is replicated ×buckets, so right/full outer
    joins would emit each unmatched small-side row ``buckets`` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated small side "
            "would duplicate unmatched rows; use one of "
            "inner/left/left_semi/left_anti"
        )
    l_salted = with_salt(large, buckets)
    s_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = l_salted.join(s_replicated, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps column → one of sum/count/min/max (algebraic, so
    shard-combine is exact: count recombines by sum).
    Output columns are ``{fn}_{col}``.
    """
    combiner = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in combiner:
            raise ValueError(f"unsupported aggregate: {fn}")
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[getattr(F, fn)(c).alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[
            getattr(F, combiner[fn])(f"{fn}_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
    return phase2


def compact_output(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write with bounded file counts: ``target_files`` repartitions
    (per partition-column value when partitioning — one shuffle keyed
    to the layout), ``max_records_per_file`` caps the other direction.
    """
    out = df
    if target_files:
        if partition_by:
            out = out.repartition(target_files, *[F.col(c) for c in partition_by])
        else:
            out = out.repartition(target_files)
    writer = out.write.mode(mode).format(fmt)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
