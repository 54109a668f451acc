"""Sessionization: batch gaps-and-islands vs DuckDB; streaming stateful."""

from __future__ import annotations

import datetime as dt

import duckdb

from pyspark.sql import functions as F

from lightlane_spark.operators.sessions import (
    session_stats,
    sessionize,
    sessionize_stream,
)
from lightlane_spark.sources.parquet import read_table, table_path
from lightlane_spark.streaming.incremental import drain_until, run_to_completion


def test_sessionize_batch_semantics(spark):
    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [
            (1, ts(0)), (1, ts(10)), (1, ts(50)), (1, ts(55)),  # 2 sessions
            (2, ts(0)),  # 1 session
        ],
        "user_id: bigint, ts: timestamp",
    )
    out = sessionize(df, gap_minutes=30).orderBy("user_id", "ts").collect()
    assert [r.session_id for r in out] == [1, 1, 2, 2, 1]
    stats = {
        (r.user_id, r.session_id): r.n_events
        for r in session_stats(df, gap_minutes=30).collect()
    }
    assert stats == {(1, 1): 2, (1, 2): 2, (2, 1): 1}


def test_sessionize_fractional_second_gap(spark):
    """A 3600.5s gap must SPLIT at a 60-min timeout in both engines.

    unix_timestamp truncates to whole seconds (gap would read 3600 and
    merge); the operator compares integer microseconds instead.
    """
    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(seconds=3600, microseconds=500_000)),  # split
        (2, t0),
        (2, t0 + dt.timedelta(seconds=3599, microseconds=500_000)),  # merge
    ]
    df = spark.createDataFrame(rows, "user_id: bigint, ts: timestamp")
    got = {
        (r.user_id, r.session_id): r.n_events
        for r in session_stats(df, gap_minutes=60).collect()
    }
    assert got == {(1, 1): 1, (1, 2): 1, (2, 1): 2}
    exp = {
        (u, s): n
        for u, s, n in duckdb.sql(
            """
            WITH e AS (
                SELECT * FROM (VALUES
                    (1, TIMESTAMP '2025-01-01 00:00:00'),
                    (1, TIMESTAMP '2025-01-01 01:00:00.5'),
                    (2, TIMESTAMP '2025-01-01 00:00:00'),
                    (2, TIMESTAMP '2025-01-01 00:59:59.5')
                ) AS t(user_id, ts)
            ), o AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                            THEN 1 ELSE 0 END AS opens
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id,
                       SUM(opens) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
                FROM o
            )
            SELECT user_id, session_id, count(*) FROM s GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == exp


def test_sessionize_matches_duckdb(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    got = {
        (r.user_id, r.session_id): r.n_events
        for r in session_stats(ev, gap_minutes=60).collect()
    }
    exp = dict()
    for user_id, session_id, n in duckdb.sql(
        f"""
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) > 3600
                        THEN 1 ELSE 0 END AS opens
            FROM '{table_path(sf_dir, "events")}'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts,
                   SUM(opens) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM e
        )
        SELECT user_id, session_id, count(*) FROM s GROUP BY 1, 2
        """
    ).fetchall():
        exp[(user_id, session_id)] = n
    assert got == exp


def test_sessionize_stream_closes_sessions(spark, tmp_path):
    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=5)),
        (1, t0 + dt.timedelta(minutes=90)),  # closes session 1 (gap 85m)
        (2, t0),
    ]
    land = str(tmp_path / "land")
    spark.createDataFrame(rows, "user_id: bigint, ts: timestamp").write.parquet(land)
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp").parquet(land)
    )
    # short processing-time flush so the availableNow drain closes the
    # idle sessions and terminates
    out = sessionize_stream(stream, gap_minutes=30, timeout_seconds=3)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain_until(q, lambda: spark.table("sess_out").count() >= 3, timeout_sec=180)
    closed = {
        (r.user_id, r.n_events) for r in spark.table("sess_out").collect()
    }
    # user 1: session of 2 events closed by the later event, then the
    # singleton closed by timeout; user 2's singleton closed by timeout
    assert closed == {(1, 2), (1, 1), (2, 1)}


def test_session_window_exact_gap_merges(spark):
    """Spark's session_window merges windows that exactly touch (split
    iff diff > gap) — pinned here because the DuckDB oracle encodes the
    same convention."""
    from lightlane_spark.operators.sessions import session_window_stats

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:10:00"),      # exactly gap after -> merge
            (1, "2024-01-01 00:20:00.000001"),  # gap + 1us -> split
            (2, "2024-01-01 00:00:00"),
        ],
        "user_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = session_window_stats(df, gap_minutes=10)
    rows = sorted(
        (r.user_id, str(r.session_start), r.n_events) for r in out.collect()
    )
    assert rows == [
        (1, "2024-01-01 00:00:00", 2),
        (1, "2024-01-01 00:20:00.000001", 1),
        (2, "2024-01-01 00:00:00", 1),
    ]
