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


def test_watermark_drops_late_row_after_finalization(spark, tmp_path):
    """Append-mode late-data guarantee: once the watermark has passed a
    window's end AND its eviction batch has run, a late row for that
    window is discarded — the window is emitted exactly once with only
    its on-time rows, never re-emitted or re-counted. (Subtlety pinned
    deliberately: a late row arriving in the SAME batch as the
    eviction still joins the state — Spark's input filter uses the
    watermark committed by the previous batch — so this test lands
    the late row two batches after the window closed.)"""
    import glob
    import os
    import shutil
    import time as _time

    from lightlane_spark.streaming.incremental import (
        run_to_completion,
        stream_from_directory,
        windowed_counts,
    )

    land = str(tmp_path / "late_land")
    os.makedirs(land)

    def stage(rows, name):
        tmp = str(tmp_path / f"stage_{name}")
        (
            spark.createDataFrame(rows, "event_id: bigint, ts_s: string")
            .selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts")
            .coalesce(1)
            .write.parquet(tmp)
        )
        src = glob.glob(tmp + "/part-*.parquet")[0]
        shutil.copy(src, os.path.join(land, f"{name}.parquet"))
        _time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    stage([(1, "2024-01-01 09:15:00"), (2, "2024-01-01 12:00:00")], "b1")
    stage([(3, "2024-01-01 11:30:00")], "b2")   # eviction batch for [09:00)
    stage([(4, "2024-01-01 09:30:00")], "b3")   # late: state gone -> dropped
    stage([(5, "2024-01-01 15:00:00")], "b4")   # flush remaining windows

    schema = "event_id bigint, ts timestamp"
    stream = stream_from_directory(spark, land, schema, max_files_per_trigger=1)
    agg = windowed_counts(
        stream, ts_col="ts", window="1 hour", watermark="1 hour", group_cols=[]
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 4, "staged files collapsed into too few batches"
    rows = sorted(
        (str(r.window_start), r.n) for r in spark.table("late_counts").collect()
    )
    assert [n for w, n in rows if w == "2024-01-01 09:00:00"] == [1]
    assert ("2024-01-01 11:00:00", 1) in rows
    assert ("2024-01-01 12:00:00", 1) in rows
