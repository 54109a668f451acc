"""Streaming dedup within watermark vs batch distinct."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightlane_spark.sources.parquet import read_table
from lightlane_spark.streaming.incremental import (
    run_to_completion,
    stream_from_directory,
    streaming_dedup,
)


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, tmp_path):
    land = str(tmp_path / "land")
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    # land the data twice: an at-least-once source with full replays
    ev.write.mode("append").parquet(land)
    ev.write.mode("append").parquet(land)
    stream = stream_from_directory(spark, land, ev.schema)
    deduped = streaming_dedup(stream, ["event_id"], ts_col="ts", watermark="1 day")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = spark.table("dedup_out")
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
