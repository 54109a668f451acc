"""Temporal operators Spark lacks natively: as-of join, range
(interval) join, hypertable-style multi-granularity time rollup, and
gap-filling resample (densify + zero/forward fill).

These are the classic "custom operator" cases from the build brief —
each is expressed as a composition of DataFrame ops (no Python UDFs),
so Catalyst/AQE still plan them and they keep their exact SQL oracles.

Scale design:
  - as-of join: the naive formulation is a non-equi join (one range
    predicate per row) which Spark can only execute as a broadcast
    nested loop. The union+window formulation here is ONE shuffle of
    left+right keyed by the `by` columns, then a running `last(...,
    ignorenulls=True)` — linear work, no join operator at all, skew
    bounded by the hottest `by` key exactly like any window.
  - range join: big×big interval joins degrade to nested loops; the
    binned form discretizes intervals to `bin_width` buckets and
    equi-joins on the bucket id, so the shuffle is hash-partitioned
    and each pair is examined once (a right interval spans multiple
    bins but a left point lives in exactly one, so no dedup pass).
    Pick `bin_width` near the median interval width: wider bins add
    false candidates, narrower bins replicate right rows.
  - time rollup: all granularities in ONE shuffle — each row explodes
    to (grain, bucket) pairs first, then a single groupBy aggregates
    every grain at once (vs one shuffle per grain for a UNION of
    date_truncs). Partial aggregation still applies map-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row's ``value_cols``.

    ``backward``: latest right row with ``right.ts <= left.ts`` (the
    pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` default); ``forward``:
    earliest right row with ``right.ts >= left.ts``. Unmatched left
    rows keep NULL values (left-outer semantics). Matched values come
    back as ``value_cols`` plus ``__asof_ts`` (the matched right
    timestamp). ``tolerance_seconds`` nulls out matches farther than
    the tolerance from the left timestamp.

    Right rows must be unique per (by, ts) — pre-aggregate otherwise
    (ties would make "the" matched row nondeterministic).

    Implementation: union both sides (right rows carry a struct of
    their values, left rows carry NULL), sort within each ``by`` group
    by (ts, side) with the right side first on equal timestamps so
    same-instant rows match inclusively, and take the running
    ``last(struct, ignorenulls=True)``. One shuffle, no join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        F.col(ts_col).alias("__asof_ts"), *[F.col(c) for c in value_cols]
    )
    r2 = (
        right.withColumn("__r", payload)
        .select(*by, ts_col, "__r")
        .withColumn("__is_l", F.lit(0))
    )
    l2 = left.withColumn("__is_l", F.lit(1))
    unioned = l2.unionByName(r2, allowMissingColumns=True)

    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        # timestamp_diff (not unix_micros) so TIMESTAMP_NTZ — the type
        # naive parquet event times load as — works as well as TIMESTAMP.
        gap = (
            F.abs(F.timestamp_diff("MICROSECOND", matched["__asof_ts"], F.col(ts_col)))
            / 1e6
        )
        matched = F.when(gap <= tolerance_seconds, matched)
    out = (
        unioned.withColumn("__m", matched)
        .filter(F.col("__is_l") == 1)
        .drop("__is_l", "__r")
    )
    for c in ("__asof_ts", *value_cols):
        out = out.withColumn(c, F.col("__m")[c])
    return out.drop("__m")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner join on ``lo <= value <= hi`` via bin-bucketed equi-join.

    Each right interval replicates to every bin it overlaps
    (``sequence(floor(lo/w), floor(hi/w))``); each left point hashes to
    exactly one bin, so the equi-join on the bin id emits every
    matching pair exactly once and nothing needs a distinct. The
    residual BETWEEN filter removes same-bin false candidates.
    """
    w = F.lit(bin_width)
    r_binned = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    l_binned = left.withColumn("__bin", F.floor(F.col(value_col) / w).cast("long"))
    return (
        l_binned.join(r_binned, on="__bin")
        .filter(F.col(value_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__bin")
    )


def resample_fill(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    aggs: Sequence[Column],
    freq: str = "day",
    zero_fill: Sequence[str] = (),
    forward_fill: Sequence[str] = (),
) -> DataFrame:
    """Gap-filling resample: aggregate to a ``freq`` grid per key,
    then DENSIFY — every key gets one row per bucket between its first
    and last observation, with missing buckets filled (``zero_fill``
    columns → 0, ``forward_fill`` columns → last seen value, others →
    NULL). The classic time-series feature-prep step Spark has no
    native operator for (TimescaleDB ``time_bucket_gapfill`` /
    pandas ``resample().ffill()``).

    Returns (*key_cols, bucket, *agg_cols). Scale shape: one shuffle
    to the (key, bucket) aggregate, one to the per-key span, one
    equi-join of the exploded grid back onto the aggregate, one
    window pass for the forward fill — all linear; grid size is
    Σ_key span/freq rows (bounded by time span, not event count; a
    key observed once contributes one row). Skew follows the hottest
    key's span, not its event volume.
    """
    bucket = F.date_trunc(freq, F.col(ts_col)).alias("bucket")
    agg = df.groupBy(*key_cols, bucket).agg(*aggs)
    span = agg.groupBy(*key_cols).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"interval 1 {freq}"))
        ).alias("bucket"),
    )
    out = grid.join(agg, on=[*key_cols, "bucket"], how="left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    for c in forward_fill:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def time_rollup(
    df: DataFrame,
    ts_col: str,
    grains: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Hypertable-style rollup: aggregate at several time granularities
    (e.g. ``["hour", "day", "week"]``) in one pass / one shuffle.

    Returns (grain, bucket, *aggs) — ``bucket`` is ``date_trunc(grain,
    ts)``. Rows explode to one (grain, bucket) pair per granularity
    up front so a single groupBy covers every grain; map-side partial
    aggregation keeps the shuffle at |buckets|·|grains| rows per task.
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(g).alias("grain"), F.date_trunc(g, F.col(ts_col)).alias("bucket")
            )
            for g in grains
        ]
    )
    return (
        df.withColumn("__gb", F.explode(pairs))
        .groupBy(F.col("__gb.grain").alias("grain"), F.col("__gb.bucket").alias("bucket"))
        .agg(*aggs)
    )


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket: Column,
    out_col: str = "running",
) -> DataFrame:
    """Cumulative sum over a GLOBAL ordering without the global-window
    scale trap. ``Window.orderBy`` with no partition key runs the
    whole table through ONE task — the canonical 100 TB killer. The
    two-phase form here keeps every stage parallel:

      1. per-bucket running sum (window partitioned by ``bucket``,
         parallel across buckets),
      2. bucket totals → cumulative offsets: a window over the BUCKET
         relation only (rows = number of buckets, thousands not
         billions — the only single-task structure, and it is
         bounded by bucket cardinality, not data size),
      3. broadcast the offsets back; final = local running + offset
         of every earlier bucket.

    ``bucket`` must be a deterministic function of ``order_col`` that
    respects its order (e.g. ``date_trunc('day', ts)`` for a
    timestamp order key) — partition-id tricks would tie results to
    physical planning. ``order_col`` values must be unique within a
    bucket (pre-aggregate ties first); uniqueness makes the running
    value frame-unambiguous on both engines.

    The input is deliberately NOT persisted: the windowed path and
    the bucket-totals branch both hash-partition by ``__bk``, so the
    two consumers share ONE exchange at runtime (ReusedExchange —
    identical canonicalized children). An r8 experiment that pinned
    the input measured concurrency_curve at ~6.6 s vs 0.64 s idle:
    the persist replaced a free exchange-reuse with a corpus-sized
    cache write. (Plan-text scan counts overstate this shape — the
    audit counts subtree mentions, not executed scans.)
    """
    d = df.withColumn("__bk", bucket)
    local = F.sum(value_col).over(
        Window.partitionBy("__bk").orderBy(order_col)
    )
    d = d.withColumn("__local", local)
    totals = d.groupBy("__bk").agg(F.sum(value_col).alias("__tot"))
    offsets = totals.withColumn(
        "__off",
        F.coalesce(
            F.sum("__tot").over(
                Window.orderBy("__bk").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__bk", "__off")
    return (
        d.join(F.broadcast(offsets), "__bk")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__bk", "__local")
    )


def sweep_line_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    grain: str = "day",
) -> DataFrame:
    """Max concurrent intervals per time grain via a sweep line:
    +1/−1 boundary events, delta pre-aggregation per distinct
    timestamp (collapses ties AND shrinks the sweep relation to
    distinct boundaries), then ``global_running_sum`` over boundary
    time. Interval semantics are half-open [start, end): an interval
    ending exactly when another starts does not overlap it.

    The naive formulation is a self-join on overlap (quadratic) or a
    single global window (one task); this is one groupBy plus the
    two-phase running sum — every stage linear and parallel.
    """
    # in-row boundary expansion (each row yields its +1 and −1 events
    # from ONE read) — the starts ∪ ends union form scanned the input
    # twice for the same rows (r8 lineage audit)
    deltas = (
        df.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(start_col).alias("t"), F.lit(1).alias("d")
                    ),
                    F.struct(
                        F.col(end_col).alias("t"), F.lit(-1).alias("d")
                    ),
                )
            ).alias("__e")
        )
        .select(F.col("__e.t").alias("t"), F.col("__e.d").alias("d"))
        .groupBy("t")
        .agg(F.sum("d").alias("delta"))
    )
    run = global_running_sum(
        deltas, "t", "delta", F.date_trunc(grain, F.col("t")), out_col="conc"
    )
    return (
        run.groupBy(F.date_trunc(grain, F.col("t")).alias("bucket"))
        .agg(F.max("conc").alias("max_concurrency"))
    )
