#!/usr/bin/env python
"""Streaming operator micro-bench (VERDICT r13 ask #5): the streaming
operators (streaming/incremental.py) are deliberately outside the
driver bench's timed HEADLINE set, so until now no committed artifact
recorded their throughput. This tool gives the next optimization round
a baseline: rows/sec through the three state-bearing operator shapes —
watermarked dedup (dropDuplicatesWithinWatermark), event-time windowed
aggregation, and the watermarked stream-stream interval join — each
drained with ``trigger(availableNow=True)`` over a factor-N landing
directory derived from the sf0.1 events table (one id-shifted copy per
file; /root/testdata is never touched).

Methodology matches bench.py: N reps per operator, best reported,
fresh checkpoint/sink per rep (state must be rebuilt from zero — no
cross-rep state reuse), loadavg recorded. Input volume is counted as
rows WRITTEN to the landing zone (what the source must ingest).

Run:  python tools/stream_bench.py [--factor 10] [--reps 3]
      [--src /root/testdata/sf0.1]
Output: STREAM_BENCH.json at the repo root (override with --out).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(ROOT, "STREAM_BENCH.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lightlane_spark.session import get_spark
    from lightlane_spark.sources.parquet import read_table
    from lightlane_spark.streaming.incremental import (
        _as_event_time,
        run_to_completion,
        stream_from_directory,
        stream_stream_join,
        windowed_counts,
    )

    load_start = os.getloadavg()
    spark = get_spark(app_name="lightlane-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="llspark_stream_bench_")
    ev = read_table(spark, args.src, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    # factor-N landing zone: one id-shifted copy per file (disjoint
    # event_id/user_id ranges, same fixed ts distribution), so the
    # dedup keeps every copy's rows and state scales with N.
    land = os.path.join(base, "events")
    stride = 10
    mx = ev.agg(F.max("event_id"), F.max("user_id")).first()
    while stride <= max(int(mx[0]), int(mx[1])):
        stride *= 10
    for i in range(args.factor):
        ev.select(
            (F.col("event_id") + i * stride).alias("event_id"),
            (F.col("user_id") + i * stride).alias("user_id"),
            "ts",
            "event_type",
        ).coalesce(1).write.mode("append").parquet(land)
    n_events = spark.read.parquet(land).count()
    schema = spark.read.parquet(land).schema

    # interval-join landing zones (views/clicks split of the same data)
    views_land, clicks_land = os.path.join(base, "views"), os.path.join(
        base, "clicks"
    )
    evn = spark.read.parquet(land)
    views_b = evn.filter(F.col("event_type") == "view").select("user_id", "ts")
    clicks_b = evn.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    views_b.write.mode("overwrite").parquet(views_land)
    clicks_b.write.mode("overwrite").parquet(clicks_land)
    n_views = spark.read.parquet(views_land).count()
    n_clicks = spark.read.parquet(clicks_land).count()

    def drain(make_writer):
        """Start a fresh availableNow query, await it, return wall s."""
        t0 = time.perf_counter()
        q = make_writer().start()
        run_to_completion(q)
        return round(time.perf_counter() - t0, 3)

    def bench(label, rows_in, make_writer):
        reps = []
        for _ in range(args.reps):
            reps.append(drain(make_writer))
        best = min(reps)
        out[label] = {
            "rows_in": rows_in,
            "reps_sec": reps,
            "best_sec": best,
            "rows_per_sec": round(rows_in / best),
        }
        print(f"stream_bench: {label} reps={reps} -> "
              f"{out[label]['rows_per_sec']} rows/s", flush=True)

    out: dict = {}

    def dedup_writer():
        stream = _as_event_time(stream_from_directory(spark, land, schema), "ts")
        deduped = stream.withWatermark("ts", "3650 days").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        counts = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        return (
            counts.writeStream.format("memory")
            .queryName("llsb_" + uuid.uuid4().hex[:8])
            .option("checkpointLocation", tempfile.mkdtemp(prefix="llsb_ck_", dir=base))
            .outputMode("complete")
            .trigger(availableNow=True)
        )

    def window_writer():
        stream = stream_from_directory(spark, land, schema)
        win = windowed_counts(
            stream, ts_col="ts", window="1 hour", watermark="3650 days",
            group_cols=["event_type"],
        )
        return (
            win.writeStream.format("memory")
            .queryName("llsb_" + uuid.uuid4().hex[:8])
            .option("checkpointLocation", tempfile.mkdtemp(prefix="llsb_ck_", dir=base))
            .outputMode("complete")
            .trigger(availableNow=True)
        )

    def join_writer():
        views = stream_from_directory(spark, views_land, views_b.schema)
        clicks = stream_from_directory(spark, clicks_land, clicks_b.schema)
        joined = stream_stream_join(
            views, clicks, keys=["user_id"], left_ts="ts", right_ts="c_ts",
            watermark="3650 days", max_delay="30 minutes",
        )
        matched = joined.select(F.col("l.user_id").alias("user_id"))
        return (
            matched.writeStream.format("memory")
            .queryName("llsb_" + uuid.uuid4().hex[:8])
            .option("checkpointLocation", tempfile.mkdtemp(prefix="llsb_ck_", dir=base))
            .outputMode("append")
            .trigger(availableNow=True)
        )

    bench("streaming_dedup_counts", n_events, dedup_writer)
    bench("windowed_counts", n_events, window_writer)
    bench("streaming_interval_join", n_views + n_clicks, join_writer)

    result = {
        "factor": args.factor,
        "src": args.src,
        "n_events": n_events,
        "n_views": n_views,
        "n_clicks": n_clicks,
        "reps": args.reps,
        "idle": load_start[0] <= 1.0,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "operators": out,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(f"stream_bench: wrote {args.out}")
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
