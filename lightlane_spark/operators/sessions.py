"""Sessionization — gaps-and-islands in batch, custom stateful
operator in streaming (extension beyond reference parity; the
reference has no event-time semantics at all, SURVEY §2.5).

Batch: the classic two-window formulation — a session opens where the
gap from the previous event exceeds the timeout; the session id is the
running count of opens. Two shuffles on the user key (both windows
share partitioning, Catalyst reuses the sort).

Streaming: ``applyInPandasWithState`` keeps (last_ts, session_start,
count) per user with a processing-time timeout — the Spark-native
shape for operators the built-in windowing can't express. State size
is O(active users), bounded by the timeout.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign ``session_id`` (1-based per user, time-ordered) to every
    event: a new session starts where the gap > ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    prev_ts = F.lag(ts_col).over(w)
    # Microsecond-exact gap: unix_timestamp truncates to whole seconds,
    # which would merge a 3600.5s gap that a fractional-second engine
    # (e.g. DuckDB's epoch_us) splits. timestamp_diff compares in integer
    # microseconds and (unlike unix_micros) accepts TIMESTAMP_NTZ — the
    # type parquet event times load as — as well as TIMESTAMP.
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    opens = F.when(
        prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(F.col(ts_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(opens).over(running))


def session_window_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per session via Spark's native ``session_window`` —
    the built-in dynamic-gap form of :func:`session_stats` (same
    single shuffle on the user key; sessions merge transitively when
    events are within the gap of each other). ``session_end`` is
    Spark's window end = last event + gap, and works identically in
    Structured Streaming group-bys (watermark evicts closed sessions).
    """
    sw = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    return (
        df.groupBy(F.col(user_col), sw.alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per session: bounds + event count."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _utc_naive(epoch_sec: int) -> dt.datetime:
    """UTC wall-clock for an epoch second, tz-naive (Arrow-friendly);
    ``utcfromtimestamp`` is deprecated in Python 3.12."""
    return dt.datetime.fromtimestamp(epoch_sec, tz=dt.timezone.utc).replace(tzinfo=None)


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
_STATE_SCHEMA = "start long, last long, n long"


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    timeout_seconds: int | None = None,
) -> DataFrame:
    """Streaming sessionization: emits a row per CLOSED session (closed
    by a later event from the same user, or by processing-time timeout).

    Custom stateful operator via ``applyInPandasWithState`` — the
    pattern for semantics outside built-in windowed aggregation.

    ``timeout_seconds`` (default: the gap) is the PROCESSING-time idle
    flush, decoupled from the EVENT-time gap: an availableNow drain
    run keeps executing state-cleanup micro-batches until every
    pending timeout fires, so a bounded drain wants a short flush even
    when the session gap is long.

    Requires ``spark.sql.session.timeZone=UTC`` (the session default in
    ``session.py``): epoch seconds and the emitted naive timestamps are
    both computed UTC-side, so a non-UTC session zone would shift gap
    arithmetic across DST transitions.
    """
    from lightlane_spark.shipping import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    gap_sec = gap_minutes * 60
    timeout_ms = 1000 * (timeout_seconds if timeout_seconds is not None else gap_sec)

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(
                    int(t.timestamp()) for t in pd.to_datetime(pdf[ts_col])
                )
            ts_list.sort()
            start, last, n = state.get if state.exists else (None, None, 0)
            for t in ts_list:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_sec:
                    closed.append((user_id, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            state.update((start, last, n))
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [_utc_naive(c[1]) for c in closed],
                    "session_end": [_utc_naive(c[2]) for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return events.groupBy(F.col(user_col)).applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
