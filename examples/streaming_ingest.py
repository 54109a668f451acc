"""Streaming ingest walkthrough at sf0.001: events land as files, a
watermarked windowed aggregation maintains per-type daily counts, and
a foreachBatch MERGE keeps a deduplicated parquet target current —
the incremental-load loop the reference runs as cron'd batch jobs,
here as one restartable streaming query each.

Run: python examples/streaming_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from lightlane_spark import get_spark, read_table
    from lightlane_spark.streaming.incremental import (
        run_to_completion,
        stream_from_directory,
        streaming_merge,
        windowed_counts,
    )

    spark = get_spark(app_name="example-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="stream_ingest_")
    land = f"{base}/landing"

    ev = read_table(spark, sf_dir, "events")
    # simulate three arriving batches
    ev.withColumn("__p", F.col("event_id") % 3).repartitionByRange(
        3, "__p"
    ).drop("__p").write.parquet(land)

    # 1. watermarked windowed counts into a memory table
    stream = stream_from_directory(spark, land, ev.schema, max_files_per_trigger=1)
    agg = windowed_counts(
        stream, ts_col="ts", window="1 day", watermark="2 days",
        group_cols=["event_type"],
    )
    q1 = (
        agg.writeStream.format("memory").queryName("daily_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    run_to_completion(q1)
    n_windows = spark.table("daily_counts").count()

    # 2. foreachBatch MERGE: latest event per user upserted into parquet
    target = f"{base}/user_latest"
    ev.where("event_id < 0").select("user_id", "ts", "event_type").write.parquet(
        target
    )  # empty target with schema
    upserts = stream_from_directory(
        spark, land, ev.schema, max_files_per_trigger=1
    ).select("user_id", "ts", "event_type")
    q2 = streaming_merge(
        upserts, target, ["user_id"], f"{base}/ck_merge",
        orderby=[F.col("ts").desc()],
    )
    run_to_completion(q2)
    merged = spark.read.parquet(target)
    n_users = merged.count()

    # the target holds exactly one (latest) row per user
    exact = ev.groupBy("user_id").agg(F.max("ts").alias("ts")).count()
    report = {
        "event_rows": ev.count(),
        "daily_windows": n_windows,
        "users_in_target": n_users,
        "expected_users": exact,
    }
    print(report)
    assert n_users == exact and n_windows > 0
    return report


if __name__ == "__main__":
    main(*sys.argv[1:2])
