"""Stream-stream watermarked join (impressions→clicks attribution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightlane_spark.sources.parquet import read_table
from lightlane_spark.streaming.incremental import (
    run_to_completion,
    stream_from_directory,
    stream_stream_join,
)


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """views (left) joined to same-user clicks within 10 minutes — the
    streaming result must equal the equivalent batch join."""
    ev = read_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.write.mode("overwrite").parquet(vdir)
    clicks.write.mode("overwrite").parquet(cdir)

    joined = stream_stream_join(
        stream_from_directory(spark, vdir, views.schema),
        stream_from_directory(spark, cdir, clicks.schema),
        keys=["user_id"],
        left_ts="view_ts",
        right_ts="click_ts",
        watermark="1 hour",
        max_delay="10 minutes",
    )
    assert joined.isStreaming
    q = (
        joined.select("view_id", "click_id")
        .writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = {(r.view_id, r.click_id) for r in spark.table("attributed").collect()}

    exp = {
        (r.view_id, r.click_id)
        for r in views.join(clicks, on="user_id")
        .filter(
            (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 10 minutes"))
        )
        .collect()
    }
    assert len(exp) > 0
    assert got == exp


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static join (the common enrichment pattern): a streaming
    event scan broadcast-joined to a static dimension must equal the
    batch join — the static side is re-resolved per micro-batch, no
    watermark or state needed."""
    from pyspark.sql import functions as F

    from lightlane_spark.sources.parquet import read_table
    from lightlane_spark.streaming.incremental import (
        run_to_completion,
        stream_from_directory,
    )

    land = str(tmp_path / "landing_enrich")
    ev = read_table(spark, sf_dir, "events")
    ev.write.parquet(land)
    dim = spark.createDataFrame(
        [("click", "engage"), ("view", "passive"), ("purchase", "convert")],
        "event_type: string, bucket: string",
    )
    stream = stream_from_directory(spark, land, ev.schema)
    enriched = stream.join(F.broadcast(dim), "event_type").select(
        "event_id", "event_type", "bucket"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = {
        (r.event_id, r.bucket) for r in spark.table("enrich_stream").collect()
    }
    exp = {
        (r.event_id, r.bucket)
        for r in ev.join(dim, "event_type").select("event_id", "bucket").collect()
    }
    assert got == exp and len(got) > 0
