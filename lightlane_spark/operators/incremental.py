"""Watermark-based incremental extract — the batch-incremental pattern
the reference approximates with MERGE mode (OP-27) made explicit.

``high_watermark`` reads the target's max watermark (one aggregate —
parquet footer stats short-circuit it); ``extract_since`` filters the
source to rows past it (predicate pushed to the source scan / JDBC
WHERE); ``incremental_merge_load`` chains extract→merge so each run
moves only new/changed rows. Late arrivals with older watermarks are
the caller's choice: overlap the window (``overlap``) and let MERGE
dedup on the PKs — re-merging an already-loaded row is idempotent.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lightlane_spark.loaders.loader import Loader


def high_watermark(df: DataFrame, col: str):
    """Max of the watermark column (None on empty input)."""
    return df.agg(F.max(col).alias("hw")).first()["hw"]


def extract_since(
    df: DataFrame,
    watermark_col: str,
    last_value,
    overlap: dt.timedelta | int | None = None,
) -> DataFrame:
    """Rows with ``watermark_col > last_value`` (full scan when
    ``last_value`` is None — first run). ``overlap`` widens the window
    backwards to re-capture late arrivals; MERGE makes the re-read
    idempotent."""
    if last_value is None:
        return df
    if overlap is not None:
        last_value = last_value - overlap
    return df.filter(F.col(watermark_col) > F.lit(last_value))


def incremental_merge_load(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    watermark_col: str,
    primary_keys: list[str],
    overlap: dt.timedelta | int | None = None,
) -> int:
    """One incremental run: read target watermark → extract newer
    source rows → MERGE. Returns the number of extracted rows."""
    last = None
    if os.path.exists(target_path):
        last = high_watermark(spark.read.parquet(target_path), watermark_col)
    batch = extract_since(source, watermark_col, last, overlap)
    n = batch.count()
    if n:
        Loader(spark, target_path, "merge", primary_keys=primary_keys).execute(batch)
    return n
