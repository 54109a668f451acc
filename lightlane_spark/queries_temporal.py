"""Temporal-operator queries + DuckDB oracles (as-of join, range
join, hypertable rollup) — merged into ``__spark_entry__.queries()``.

The as-of oracle uses DuckDB's native ``ASOF LEFT JOIN``; the Spark
side is the union+window single-shuffle formulation
(operators/temporal.py), so the comparison is two genuinely
independent implementations of the same semantics.

Float policy: SUMs go through exact DECIMAL at expression scale;
everything else here is integers, timestamps, or per-row doubles
(identical IEEE ops in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lightlane_spark.operators.temporal import (
    asof_join,
    range_join_binned,
    time_rollup,
)
from lightlane_spark.sources.parquet import read_table

from lightlane_spark.cache import tracked_persist


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
    )


def _errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right side, unique per (user_id, ts) by construction."""
    return (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
    )


def _asof_output(out: DataFrame) -> DataFrame:
    """Driver-contract shape: unmatched rows keep left-outer NULLs in
    the operator, but the declared query coalesces them to sentinels
    (the driver's row-sorting canonicalization can't order NULLs)."""
    return out.select(
        "event_id",
        "user_id",
        "ts",
        # timestamp_ntz emit: TZ-adjusted timestamps collect in the
        # host Python zone (see sources/parquet.py session pin note)
        F.coalesce(
            F.col("__asof_ts"), F.lit("1970-01-01").cast("timestamp")
        )
        .cast("timestamp_ntz")
        .alias("err_ts"),
        F.coalesce(F.col("err_value"), F.lit(-1.0)).alias("err_value"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each click gets the user's latest error at or
    before the click (sentinel when none)."""
    return _asof_output(
        asof_join(
            _clicks(spark, sf_dir),
            _errors(spark, sf_dir),
            ts_col="ts",
            by=["user_id"],
            value_cols=["err_value"],
        )
    )


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click gets the user's next error at or
    after the click."""
    return _asof_output(
        asof_join(
            _clicks(spark, sf_dir),
            _errors(spark, sf_dir),
            ts_col="ts",
            by=["user_id"],
            value_cols=["err_value"],
            direction="forward",
        )
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events against 12 overlapping value bands
    (non-aligned bounds force genuine range semantics; bin width 40
    ≈ band width so right rows replicate ~2×)."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.range(12).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 40.0).alias("lo"),
        (F.col("id") * 40.0 + 55.0).alias("hi"),
    )
    out = range_join_binned(ev, bands, "value", "lo", "hi", bin_width=40.0)
    return out.select("event_id", "band_id", "value")


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: hour/day/week aggregates in one
    shuffle (explode-to-grain then a single groupBy)."""
    ev = read_table(spark, sf_dir, "events")
    out = time_rollup(
        ev,
        "ts",
        ["hour", "day", "week"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("sum_value"),
        ],
    )
    # timestamp_ntz emit: host-zone-proof collection
    return out.withColumn("bucket", F.col("bucket").cast("timestamp_ntz"))


def q_resample_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling daily resample (operators/temporal.py::resample_fill):
    a sparse event subset (~1%, deterministic) aggregated per
    event_type per day, densified to every day in each type's span —
    counts zero-filled, the running sum forward-filled. Exact SQL
    oracle (generate_series + IGNORE NULLS window in DuckDB)."""
    from lightlane_spark.operators.temporal import resample_fill

    ev = read_table(spark, sf_dir, "events").filter("event_id % 97 = 0")
    out = resample_fill(
        ev,
        "ts",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)"))
            .cast("double")
            .alias("sum_value"),
        ],
        freq="day",
        zero_fill=["n_events"],
        forward_fill=["sum_value"],
    )
    return out.select(
        "event_type",
        # timestamp_ntz emit: host-zone-proof collection
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        "n_events",
        "sum_value",
    )


def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: each stage's
    timestamp must strictly follow the previous stage's FIRST
    occurrence per user. Three per-user min-aggregations chained by
    user_id joins — after the first aggregation everything is
    co-partitioned on user_id, so AQE reuses the exchange; no window
    over raw events (the naive sessionized-scan formulation shuffles
    the full event log per stage). Emits one row of stage counts."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(etype: str, prev, prev_col: str, out: str):
        e = ev.where(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col(prev_col))
        # user-cardinality, two consumers each (next stage's join +
        # this stage's count) — persist, or every stage re-scans the
        # event log per consumer (r7 plan audit: 6 corpus scans)
        return tracked_persist(
            e.groupBy("user_id").agg(F.min("ts").alias(out))
        )

    views = first_after("view", None, "", "t_view")
    clicks = first_after("click", views, "t_view", "t_click")
    purchases = first_after("purchase", clicks, "t_click", "t_purchase")
    return (
        views.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(clicks.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(purchases.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, retained_k =
    distinct users active k days later (k ≤ 7). Two aggregations (first
    day per user; distinct active days per user) joined on user_id,
    then one count-distinct per (cohort, offset). The small-output /
    big-input shape every analytics store optimizes for — all
    map-side-combined aggs, no self-join of the event log."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .withColumn("offset_days", F.datediff("day", "cohort_day"))
        .where(F.col("offset_days").between(0, 7))
        .groupBy("cohort_day", "offset_days")
        .agg(F.countDistinct("user_id").alias("retained"))
    )


def q_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent one-hour sessions per day via a sweep line
    (operators/temporal.py::sweep_line_concurrency): +1/−1 boundary
    deltas pre-aggregated per distinct timestamp, then a TWO-PHASE
    global running sum — per-day window in parallel, cumulative
    day-offsets over the tiny bucket relation, broadcast back. The
    naive global Window.orderBy would run 100 TB through one task;
    here the only single-task structure is over #days. Concurrency is
    measured at interval boundaries (half-open [start, end))."""
    from lightlane_spark.operators.temporal import sweep_line_concurrency

    ev = read_table(spark, sf_dir, "events").select(
        "ts", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts_end")
    )
    out = sweep_line_concurrency(ev, "ts", "ts_end", grain="day")
    return out.select(
        F.to_date("bucket").alias("bucket"),
        F.col("max_concurrency").cast("bigint").alias("max_concurrency"),
    )


QUERIES = {
    "concurrency_curve": q_concurrency_curve,
    "asof_join": q_asof_join,
    "asof_join_forward": q_asof_join_forward,
    "range_join": q_range_join,
    "time_rollup": q_time_rollup,
    "resample_fill": q_resample_fill,
    "funnel_analysis": q_funnel_analysis,
    "retention_cohorts": q_retention_cohorts,
}


_ASOF_CTES = """
    WITH l AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), r AS (
        SELECT user_id, ts, max(value) AS err_value
        FROM events WHERE event_type = 'error' GROUP BY 1, 2
    )
"""

ORACLE = {
    "asof_join": _ASOF_CTES
    + """
        SELECT l.event_id, l.user_id, l.ts,
               COALESCE(r.ts, TIMESTAMP '1970-01-01') AS err_ts,
               COALESCE(r.err_value, -1.0) AS err_value
        FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "asof_join_forward": _ASOF_CTES
    + """
        SELECT l.event_id, l.user_id, l.ts,
               COALESCE(r.ts, TIMESTAMP '1970-01-01') AS err_ts,
               COALESCE(r.err_value, -1.0) AS err_value
        FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
    "range_join": """
        WITH bands AS (
            SELECT range AS band_id, range * 40.0 AS lo, range * 40.0 + 55.0 AS hi
            FROM range(12)
        )
        SELECT e.event_id, b.band_id, e.value
        FROM events e JOIN bands b ON e.value BETWEEN b.lo AND b.hi
    """,
    # date_trunc('day'/'week') yields DATE in DuckDB but TIMESTAMP in
    # Spark — cast so the bucket column compares as one type.
    "time_rollup": """
        SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
               COUNT(*), CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'week', CAST(date_trunc('week', ts) AS TIMESTAMP),
               COUNT(*), CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
        FROM events GROUP BY 2
    """,
    "resample_fill": """
        WITH ev AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, value
            FROM events WHERE event_id % 97 = 0
        ),
        agg AS (
            SELECT event_type, bucket, COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
            FROM ev GROUP BY 1, 2
        ),
        span AS (
            SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
            FROM agg GROUP BY 1
        ),
        grid AS (
            SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
            FROM span
        )
        SELECT g.event_type, g.bucket,
               COALESCE(a.n_events, 0) AS n_events,
               last_value(a.sum_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sum_value
        FROM grid g LEFT JOIN agg a
          ON a.event_type = g.event_type AND a.bucket = g.bucket
    """,
}

ORACLE["funnel_analysis"] = """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase
"""
ORACLE["retention_cohorts"] = """
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
    first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
    active AS (SELECT DISTINCT user_id, day FROM ev)
    SELECT f.cohort_day, a.day - f.cohort_day AS offset_days,
           count(DISTINCT a.user_id) AS retained
    FROM active a JOIN first f ON a.user_id = f.user_id
    WHERE a.day - f.cohort_day BETWEEN 0 AND 7
    GROUP BY 1, 2
"""

ORACLE["concurrency_curve"] = """
    WITH b AS (
        SELECT ts AS t, 1 AS d FROM events
        UNION ALL
        SELECT ts + INTERVAL 1 HOUR AS t, -1 AS d FROM events
    ),
    deltas AS (SELECT t, SUM(d) AS delta FROM b GROUP BY t),
    run AS (SELECT t, SUM(delta) OVER (ORDER BY t) AS conc FROM deltas)
    SELECT CAST(date_trunc('day', t) AS DATE) AS bucket,
           CAST(max(conc) AS BIGINT) AS max_concurrency
    FROM run GROUP BY 1
"""


def q_abandoned_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sequential pattern (MATCH_RECOGNIZE-with-negation
    shape): per user, clicks NOT followed by a purchase within 1 hour
    — the abandonment/churn-signal query. Expressed as a left-anti
    join from clicks to same-user purchases with a (0, 1h] range
    predicate: one shuffle per side on user_id, the range runs as a
    join-time filter, and nothing is collected or windowed globally.
    At 100 TB both sides co-partition on user_id; the anti-join is
    the exact, index-free form of "pattern A ¬B within t"."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("pts")
    )
    abandoned = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_uid"))
        & (F.col("pts") > F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        "left_anti",
    )
    total = clicks.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_clicks"))
    aband = abandoned.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_abandoned"))
    return (
        total.join(aband, "user_id", "left")
        .select(
            "user_id",
            "n_clicks",
            F.coalesce("n_abandoned", F.lit(0)).alias("n_abandoned"),
        )
        .orderBy("user_id")
    )


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact time-weighted average of the value signal per user (TWAP
    shape): each observation holds until the user's next event; weight
    = microsecond gap to the next event (BIGINT-exact). The value
    column is 2dp-exact by data contract, so CAST to DECIMAL(12,2)
    recovers its true decimal in both engines (a 2dp point is ~1e-13
    from the stored double, nowhere near a cast boundary); from there
    value·weight and the sum are pure decimal arithmetic. The emitted
    columns are CENTS-scaled BIGINTs: ``vw_cents`` = Σ value·100·dt_us
    (exact integer — value·100 is integral by the 2dp contract) and
    the BIGINT weight total — twap = vw_cents/100/w_sum is the
    consumer's division. Why not the _dec_sum double emit every other
    money sum uses: this sum reaches ~1.5e14 at scale 2 (1.5e16
    scaled units > 2^53), OUTSIDE the exactly-representable-double
    envelope, and there Spark's BigDecimal.doubleValue() and DuckDB's
    int128/10^scale path round the conversion differently by 1 ulp —
    measured locally: 36/150 rows off in the last digit. Scaled
    BIGINT is immune at any libm/engine. Overflow bound: Σdt_us per
    user ≤ the study-window span (~2.6e12 µs) regardless of SF —
    weights cover time, they don't grow with row count — so
    vw_cents ≤ 100·max_value·2.6e12 ≈ 2.6e17 « int64. The earlier
    forms quantized the DOUBLE product per row (measured red) or
    emitted the DECIMAL itself (the r9 driver-hasher red class).
    Single lead() window + one
    aggregation — two shuffles, both on user_id; last events (no
    successor) carry zero weight in both engines."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.timestamp_diff("MICROSECOND", F.col("ts"), F.lead("ts").over(w))
    weighted = ev.withColumn("dt_us", F.coalesce(dt, F.lit(0)))
    return (
        weighted.groupBy("user_id")
        .agg(
            # cents-scaled BIGINT emit: this sum exceeds the
            # exactly-representable-double envelope (see docstring),
            # so neither the decimal (r9 driver-hasher red) nor its
            # double cast (1-ulp Spark/DuckDB divergence, measured)
            # may leave the query — the integer is exact everywhere
            F.sum(
                (F.col("value").cast("decimal(12,2)") * 100)
                .cast("long")
                * F.col("dt_us")
            ).alias("vw_cents"),
            F.sum("dt_us").alias("w_sum"),
        )
        .filter(F.col("w_sum") > 0)
        .select("user_id", "vw_cents", "w_sum")
        .orderBy("user_id")
    )


QUERIES["abandoned_actions"] = q_abandoned_actions
QUERIES["time_weighted_avg"] = q_time_weighted_avg

ORACLE["abandoned_actions"] = """
    WITH c AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS cts FROM events
        WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS pts FROM events
        WHERE event_type = 'purchase'
    ), ab AS (
        SELECT c.user_id, COUNT(*) AS n_abandoned
        FROM c WHERE NOT EXISTS (
            SELECT 1 FROM p
            WHERE p.user_id = c.user_id
              AND p.pts > c.cts AND p.pts <= c.cts + INTERVAL 1 HOUR
        ) GROUP BY 1
    ), tot AS (
        SELECT user_id, COUNT(*) AS n_clicks FROM c GROUP BY 1
    )
    SELECT tot.user_id, tot.n_clicks,
           COALESCE(ab.n_abandoned, 0) AS n_abandoned
    FROM tot LEFT JOIN ab ON tot.user_id = ab.user_id
    ORDER BY tot.user_id
"""

ORACLE["time_weighted_avg"] = """
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
               COALESCE(epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id))
                 - epoch_us(CAST(ts AS TIMESTAMP)), 0) AS dt_us
        FROM events
    )
    SELECT user_id,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    * dt_us) AS BIGINT)
             AS vw_cents,
           CAST(SUM(dt_us) AS BIGINT) AS w_sum
    FROM e GROUP BY 1
    HAVING SUM(dt_us) > 0
    ORDER BY user_id
"""


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent prior touch (click/view) — the as-of join applied to the
    marketing-attribution shape. Touches are pre-deduped per
    (user, ts) (max type — the operator's documented uniqueness
    contract), then one backward as-of join and a tiny count by
    attributed type. Never-touched purchases surface as NULL (kept —
    silent drops hide attribution bugs)."""
    from lightlane_spark.operators.temporal import asof_join

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    touches = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("touch_type"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    attributed = asof_join(
        purchases,
        touches,
        ts_col="ts",
        by=["user_id"],
        value_cols=["touch_type"],
        direction="backward",
    )
    return (
        attributed.groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy(F.col("touch_type").asc_nulls_first())
    )


QUERIES["purchase_attribution"] = q_purchase_attribution

ORACLE["purchase_attribution"] = """
    WITH touches AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               MAX(event_type) AS touch_type
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY 1, 2
    ), p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        WHERE event_type = 'purchase'
    ), attr AS (
        SELECT (
            SELECT t.touch_type FROM touches t
            WHERE t.user_id = p.user_id AND t.ts <= p.ts
            ORDER BY t.ts DESC LIMIT 1
        ) AS touch_type
        FROM p
    )
    SELECT touch_type, COUNT(*) AS n_purchases
    FROM attr GROUP BY 1
    ORDER BY touch_type ASC NULLS FIRST
"""


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2, adjusted
    weights, trailing-16 window) of purchase values per user-facing
    time order — the standard smoothing pass a metrics/feature
    pipeline runs before thresholding or anomaly checks.

    Cross-engine exactness by construction: the numerator is the
    single left fold ``acc/2 + x`` over the frame's values (oldest →
    newest), which IS Σ x·2^-age with dyadic weights — no pow(), no
    reordering; the denominator is the same fold over ones. DuckDB's
    ``list_reduce`` seeds with the first element, Spark's
    ``aggregate`` seeds with 0.0 — identical sequences because
    0/2 + x₀ = x₀. Plan: one event_type partition window (frame
    collect), fold is per-row over ≤16 doubles; linear, one shuffle.

    NULL values are filtered from the base relation on BOTH engines:
    Spark's collect_list drops NULLs from the frame while DuckDB's
    list() keeps them, so an unguarded NULL would shorten Spark's
    frame and diverge (Spark numeric vs oracle NULL). Excluding the
    row symmetrically keeps the fold sequences identical whatever the
    fixture holds.
    """
    from pyspark.sql import Window

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .select("event_id", "ts", "value")
    )
    w = (
        Window.orderBy("ts", "event_id").rowsBetween(-15, 0)
    )
    vals = F.collect_list("value").over(w)
    num = F.aggregate(vals, F.lit(0.0), lambda a, x: a / 2 + x)
    den = F.aggregate(vals, F.lit(0.0), lambda a, x: a / 2 + F.lit(1.0))
    # global window over ONE event type (~2k rows at sf0.01) — the
    # single-partition sort is over the filtered slice, not the fact
    # table; for per-key smoothing add partitionBy to the window.
    return ev.select(
        "event_id", "value", (num / den).alias("ewma")
    )


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of a categorical feature (market
    segment) against a numeric target (order total): enc =
    (sum_cat + m·global_mean) / (n_cat + m) with m = 10 — the classic
    high-cardinality-categorical encoder; smoothing shrinks rare
    categories toward the global mean so they don't memorize noise.

    Exactness: both sums go through exact DECIMAL then one double
    division per category (identical IEEE ops both engines). Plan:
    fact⋈broadcast(dim), one segment aggregation; the global mean
    folds out of the same aggregate via a total over the category
    rows (no second fact scan)."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cat = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("__s"),
        )
        .transform(tracked_persist)  # read by the global-total aggregate AND the final
        # projection; lazily the fact join+agg would run twice
    )
    # global mean from the 5 category rows (exact decimal sums)
    tot = per_cat.agg(
        F.sum("__s").alias("__ts"), F.sum("n").alias("__tn")
    )
    g_mean = F.col("__ts").cast("double") / F.col("__tn")
    enc = (F.col("__s").cast("double") + 10.0 * g_mean) / (F.col("n") + 10.0)
    return (
        per_cat.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "n",
            enc.alias("enc"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES["ewma_smooth"] = q_ewma_smooth
QUERIES["target_encode"] = q_target_encode

ORACLE["ewma_smooth"] = """
    WITH p AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value::DOUBLE AS value
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ), framed AS (
        SELECT event_id, value,
               list(value) OVER (ORDER BY ts, event_id
                                 ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals
        FROM p
    )
    SELECT event_id, value,
           list_reduce(vals, (a, b) -> a / 2 + b)
               / list_reduce(list_transform(vals, x -> 1.0::DOUBLE),
                             (a, b) -> a / 2 + b) AS ewma
    FROM framed
"""

ORACLE["target_encode"] = """
    WITH per_cat AS (
        SELECT c.c_mktsegment,
               COUNT(*) AS n,
               SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS s
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ), tot AS (
        SELECT SUM(s) AS ts, SUM(n) AS tn FROM per_cat
    )
    SELECT c_mktsegment,
           CAST(n AS BIGINT) AS n,
           (CAST(s AS DOUBLE) + 10.0 * (CAST(ts AS DOUBLE) / tn))
               / (n + 10.0) AS enc
    FROM per_cat, tot
    ORDER BY c_mktsegment
"""


def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonal baseline vs the most recent week: per
    (event_type, hour-of-week) the historical mean value (everything
    OLDER than max_ts − 7 days) next to the latest week's mean and
    their difference — the standard seasonality-aware anomaly check
    (is this Monday-9am normal for a Monday-9am?).

    Hour-of-week is (epoch_seconds div 3600) mod 168 — an epoch
    anchor, not locale day-of-week, so both engines bucket
    identically. ONE corpus shuffle: the cutoff comes from a 1-row
    max aggregate broadcast onto the scan, and baseline + recent
    stats fold in the SAME groupBy via conditional aggregates
    (no second pass, no join of two aggregates). Means go through
    round-9dp DECIMAL sums ÷ count (order-independent, exact);
    empty cells surface as n=0 with 0-valued means (coalesced
    identically in both engines — the driver sort cannot order
    NULLs)."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "CAST(ts AS TIMESTAMP_NTZ))"
    )
    e = ev.select("event_type", sec.alias("es"), "value")
    mx = e.agg(F.max("es").alias("mx"))
    j = e.crossJoin(F.broadcast(mx)).withColumn(
        "how", F.expr("(es div 3600) % 168")
    )
    is_recent = F.col("es") >= F.col("mx") - F.lit(604800)
    dec = F.round(F.col("value"), 9).cast("decimal(28,9)")
    agg = j.groupBy("event_type", "how").agg(
        F.count(F.when(~is_recent, 1)).alias("n_base"),
        F.count(F.when(is_recent, 1)).alias("n_recent"),
        F.coalesce(
            F.sum(F.when(~is_recent, dec)).cast("double"), F.lit(0.0)
        ).alias("s_base"),
        F.coalesce(
            F.sum(F.when(is_recent, dec)).cast("double"), F.lit(0.0)
        ).alias("s_recent"),
    )
    mean = lambda s, n: F.when(  # noqa: E731
        F.col(n) > 0, F.col(s) / F.col(n)
    ).otherwise(F.lit(0.0))
    return agg.select(
        "event_type",
        "how",
        "n_base",
        "n_recent",
        mean("s_base", "n_base").alias("mean_base"),
        mean("s_recent", "n_recent").alias("mean_recent"),
        (mean("s_recent", "n_recent") - mean("s_base", "n_base")).alias(
            "delta"
        ),
    ).orderBy("event_type", "how")


QUERIES["seasonal_baseline"] = q_seasonal_baseline

ORACLE["seasonal_baseline"] = """
    WITH e AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS es, value
        FROM events
    ),
    mx AS (SELECT max(es) AS mx FROM e),
    agg AS (
        SELECT event_type, (es // 3600) % 168 AS how,
               count(CASE WHEN es <  mx - 604800 THEN 1 END) AS n_base,
               count(CASE WHEN es >= mx - 604800 THEN 1 END) AS n_recent,
               coalesce(CAST(SUM(CASE WHEN es < mx - 604800 THEN
                   CAST(round(value, 9) AS DECIMAL(28,9)) END) AS DOUBLE),
                   0.0) AS s_base,
               coalesce(CAST(SUM(CASE WHEN es >= mx - 604800 THEN
                   CAST(round(value, 9) AS DECIMAL(28,9)) END) AS DOUBLE),
                   0.0) AS s_recent
        FROM e, mx GROUP BY 1, 2
    )
    SELECT event_type, how, n_base, n_recent,
           CASE WHEN n_base > 0 THEN s_base / n_base ELSE 0.0 END
               AS mean_base,
           CASE WHEN n_recent > 0 THEN s_recent / n_recent ELSE 0.0 END
               AS mean_recent,
           (CASE WHEN n_recent > 0 THEN s_recent / n_recent ELSE 0.0 END)
         - (CASE WHEN n_base > 0 THEN s_base / n_base ELSE 0.0 END)
               AS delta
    FROM agg ORDER BY event_type, how
"""


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over daily event volumes, on a
    planted-shift fixture: 'click' traffic is deterministically
    thinned 40% from Jan 21 on (portable md5 of event_id, same rule
    in the oracle), every other type stays natural. Per type, the
    CUSUM path s_d = Σ_{i≤d}(x_i − x̄) is maximized over days and
    normalized by σ·√n (the standard Brownian-bridge scaling, flag
    threshold 1.358 = Kolmogorov 95%); the detector must (a) locate
    the plant at EXACTLY 2024-01-20 — the last pre-shift day, where
    the bridge peaks — with stat 2.24, and (b) keep all four
    stationary types unflagged (max 0.92, a 2.4× two-sided margin).

    All arithmetic replays bit-identically in SQL: integer daily
    counts, mean/σ from integer moments in double, cumsum ordered by
    day (same order ⇒ same fp result), round 6dp.

    Scale: one map-side-combined (type, day) count shuffle — the
    daily relation is days×types rows, so the window/argmax run over
    aggregate-sized data. The thinning filter is map-only. At 100 TB
    this is the cheapest shape anomaly detection comes in: the corpus
    is read once, everything after the first agg is metadata-sized."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    fx = ev.filter(
        ~(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
            & (F.pmod(h, F.lit(10)) < 4)
        )
    )
    daily = fx.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    from pyspark.sql import Window

    mean = F.col("sx").cast("double") / F.col("n")
    sigma = F.sqrt(F.col("sxx").cast("double") / F.col("n") - mean * mean)
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cus = daily.join(stats, "event_type").select(
        "event_type",
        "day",
        F.sum(F.col("x").cast("double") - mean).over(wc).alias("s_d"),
        sigma.alias("sigma"),
        "n",
    )
    stat = F.abs(F.col("s_d")) / (F.col("sigma") * F.sqrt(F.col("n")))
    # σ·√n is constant per type, so ordering by the normalized stat is
    # the same order as |s_d| (the oracle's ORDER BY abs(s_d))
    wr = Window.partitionBy("event_type").orderBy(
        F.col("stat").desc(), F.col("day")
    )
    ranked = cus.select(
        "event_type", "day", stat.alias("stat")
    ).withColumn("r", F.row_number().over(wr))
    return (
        ranked.filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.round("stat", 6).alias("cusum_stat"),
            (F.col("stat") > 1.358).cast("bigint").alias("flagged"),
        )
        .orderBy("event_type")
    )


QUERIES["cusum_changepoint"] = q_cusum_changepoint

ORACLE["cusum_changepoint"] = """
    WITH fx AS (
        SELECT event_type, date_trunc('day', ts) AS day FROM events
        WHERE NOT (event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
                   AND ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10 < 4)
    ),
    daily AS (
        SELECT event_type, day, count(*) AS x FROM fx GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, count(*) AS n, SUM(x) AS sx, SUM(x*x) AS sxx
        FROM daily GROUP BY 1
    ),
    cus AS (
        SELECT d.event_type, d.day,
               SUM(CAST(d.x AS DOUBLE) - CAST(s.sx AS DOUBLE) / s.n)
                 OVER (PARTITION BY d.event_type ORDER BY d.day) AS s_d,
               sqrt(CAST(s.sxx AS DOUBLE) / s.n
                    - (CAST(s.sx AS DOUBLE) / s.n)
                      * (CAST(s.sx AS DOUBLE) / s.n)) AS sigma,
               s.n AS n
        FROM daily d JOIN stats s USING (event_type)
    ),
    ranked AS (
        SELECT event_type, day,
               abs(s_d) / (sigma * sqrt(n)) AS stat,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(s_d) DESC, day) AS r
        FROM cus
    )
    SELECT event_type, day AS change_day,
           round(stat, 6) AS cusum_stat,
           CASE WHEN stat > 1.358 THEN 1 ELSE 0 END AS flagged
    FROM ranked WHERE r = 1 ORDER BY event_type
"""


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup→purchase conversion,
    per variant (user_id mod 2), with administrative RIGHT-CENSORING
    at a 2024-01-08 study cutoff — purchases after the cutoff are
    unobserved, so those users contribute risk-time but no event
    (the estimator every retention/time-to-convert analysis needs;
    naive conversion rates are biased when observation windows
    differ). S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over event days, with the
    risk set nᵢ = cohort − (events+censored strictly before tᵢ).

    Engine parity: the emitted KM table is PURE INTEGER —
    (variant, t, n_risk, d, c, dead) fully determines the curve, and
    the consumer derives S(t) = Π (1 − dᵢ/nᵢ) in one line. The
    float ``log_s`` column was dropped in r11 (VERDICT r10 ask #1a):
    every float formulation — round(exp,6) double (r7/r8), DECIMAL
    output (r9), decimal-accumulate→DOUBLE emit (r10) — stayed
    driver-red across four rounds while bit-exact green locally
    against DuckDB, so the float column itself left the hashed
    output. The integer table is the estimator's sufficient
    statistic; nothing is lost.

    Scale: two corpus-sized aggregations (first signup, first
    qualifying purchase — both map-side-combined min()s keyed by
    user), one broadcast-sized join between them; the KM table
    itself is |variants|×|distinct days| rows, window'd at that
    cardinality."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    cutoff = F.lit("2024-01-08").cast("timestamp")
    # user-cardinality relation with two consumers (p's join, obs's
    # left join) — persist so the signup scan happens once
    s = tracked_persist(
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup"))
        .filter(F.col("signup") < cutoff)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purch"))
    )
    obs = s.join(p, "user_id", "left").select(
        (F.col("user_id") % 2).alias("variant"),
        F.when(
            F.col("purch").isNotNull() & (F.col("purch") < cutoff),
            F.datediff(F.to_date("purch"), F.to_date("signup")),
        )
        .otherwise(F.datediff(F.to_date(cutoff), F.to_date("signup")))
        .alias("t"),
        (
            F.col("purch").isNotNull() & (F.col("purch") < cutoff)
        ).cast("bigint").alias("is_event"),
    )
    # materialized ONCE (cache contract): `day` is |variants|×|days|
    # rows but its lineage holds both corpus aggregations — the three
    # consumers below (tot, the n_risk window, the KM join) would each
    # re-scan events twice otherwise (plan test pins ≤2 corpus scans)
    day = tracked_persist(
        obs.groupBy("variant", "t").agg(
            F.sum("is_event").alias("d"),
            F.sum(1 - F.col("is_event")).alias("c"),
        )
    )
    from pyspark.sql import Window

    tot = day.groupBy("variant").agg(
        F.sum(F.col("d") + F.col("c")).alias("cohort")
    )
    wp = (
        Window.partitionBy("variant")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wc = (
        Window.partitionBy("variant")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    km = (
        day.join(tot, "variant")
        .withColumn(
            "n_risk",
            F.col("cohort")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wp), F.lit(0)),
        )
        .withColumn(
            "dead",
            F.max((F.col("d") >= F.col("n_risk")).cast("bigint")).over(wc),
        )
    )
    return (
        km.filter(F.col("d") > 0)
        .select("variant", "t", "n_risk", "d", "c", "dead")
        .orderBy("variant", "t")
    )


QUERIES["kaplan_meier"] = q_kaplan_meier

ORACLE["kaplan_meier"] = """
    WITH s AS (
        SELECT user_id, min(ts) AS signup FROM events
        WHERE event_type = 'signup' GROUP BY 1
        HAVING min(ts) < TIMESTAMP '2024-01-08'
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS purch
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s.signup
        GROUP BY 1
    ),
    obs AS (
        SELECT s.user_id % 2 AS variant,
               CASE WHEN p.purch IS NOT NULL AND p.purch < TIMESTAMP '2024-01-08'
                    THEN date_diff('day', CAST(s.signup AS DATE), CAST(p.purch AS DATE))
                    ELSE date_diff('day', CAST(s.signup AS DATE), DATE '2024-01-08')
               END AS t,
               CASE WHEN p.purch IS NOT NULL AND p.purch < TIMESTAMP '2024-01-08'
                    THEN 1 ELSE 0 END AS is_event
        FROM s LEFT JOIN p USING (user_id)
    ),
    day AS (
        SELECT variant, t, SUM(is_event) AS d, SUM(1 - is_event) AS c
        FROM obs GROUP BY 1, 2
    ),
    tot AS (SELECT variant, SUM(d + c) AS cohort FROM day GROUP BY 1),
    km AS (
        SELECT day.variant, t, d, c,
               cohort - coalesce(SUM(d + c) OVER (
                   PARTITION BY day.variant ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_risk
        FROM day JOIN tot ON day.variant = tot.variant
    ),
    km2 AS (
        SELECT variant, t, d, c, n_risk,
               MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
                   PARTITION BY variant ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        FROM km
    )
    SELECT variant, t,
           -- CASTs: d/c are SUM(BIGINT) -> HUGEINT in DuckDB and n_risk is
           -- HUGEINT arithmetic; Arrow renders HUGEINT as decimal128(38,0)
           -- (Python Decimal) while Spark emits int64 -- identical values,
           -- divergent types under a typed hasher. Pin all three to BIGINT.
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d,
           CAST(c AS BIGINT) AS c,
           CAST(dead AS BIGINT) AS dead
    FROM km2 WHERE d > 0 ORDER BY variant, t
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two halves of the event
    stream — THE production ML-monitoring drift metric (banking
    scorecards onward): PSI = Σ_bins (q−p)·ln(q/p) over the decile
    bins of the BASELINE period (Jan 1–15), evaluated against the
    current period (Jan 16–30), per event type. Planted fixture:
    'click' values are scaled ×2 in the current period only (same
    deterministic rule in the oracle), so the detector must flag
    click at PSI 0.363 > 0.2 (the industry action threshold) while
    every stationary type stays ≤ 0.034 — a 1.8×/5.9× two-sided
    margin. Complements
    vocab_drift (token distribution shift) with the numeric-feature
    form.

    Decile edges are the baseline's DISCRETE rank values (value at
    rank ⌈i·n/10⌉ — the winsorize/quantile_normalize contract, no
    interpolation ambiguity); bin assignment is an in-row
    size(filter(edges, e -> v > e)) against the 9-element broadcast
    edge array — map-only on both periods. Zero bins get the
    standard ε=1e-4 substitution; contributions go through round-9dp
    DECIMAL so the sum is order-independent.

    Scale: two corpus-sized aggregations (one per period, map-side
    combined over (type, bin)); the edge computation windows the
    BASELINE once; everything else is |types|×10 rows."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    split = F.lit("2024-01-16").cast("timestamp")
    base = ev.filter(F.col("ts") < split).select("event_type", "value")
    cur = ev.filter(F.col("ts") >= split).select(
        "event_type",
        F.when(
            F.col("event_type") == "click", F.col("value") * 2.0
        ).otherwise(F.col("value")).alias("value"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value")
    ranked = base.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("i"))
    # |types|-row edge relation with three consumers (both binned
    # passes + the grid) — persist, or each consumer re-runs the
    # baseline rank window (a corpus scan each; plan test pins ≤3
    # corpus scans total: edges, base bins, current bins)
    edges = tracked_persist(
        ranked.join(
            F.broadcast(deciles),
            F.col("r")
            == F.ceil(F.col("i") * F.col("n") / F.lit(10.0)).cast("long"),
        )
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("e"))
    )

    def binned(df, cnt_name):
        # one corpus pass: per-(type, bin) counts; the per-type total
        # folds out of the same aggregate (no separate count scan)
        out = (
            df.join(F.broadcast(edges), "event_type")
            .select(
                "event_type",
                F.expr("size(filter(e, x -> value > x))").alias("bin"),
            )
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias(cnt_name))
        )
        return tracked_persist(out)

    bb = binned(base, "cb")
    cc = binned(cur, "cc")
    btot = bb.groupBy("event_type").agg(F.sum("cb").alias("nb"))
    ctot = cc.groupBy("event_type").agg(F.sum("cc").alias("nc"))
    grid = (
        edges.select("event_type")
        .crossJoin(F.broadcast(spark.range(10).select(F.col("id").cast("int").alias("bin"))))
    )
    # every relation here is ≤ |types|×10 rows — broadcast explicitly
    # so the pre-AQE plan is already exchange-free (4 SMJs otherwise)
    cells = (
        grid.join(F.broadcast(bb), ["event_type", "bin"], "left")
        .join(F.broadcast(cc), ["event_type", "bin"], "left")
        .join(F.broadcast(btot), "event_type")
        .join(F.broadcast(ctot), "event_type")
    )
    p = F.greatest(
        F.coalesce(F.col("cb"), F.lit(0)).cast("double") / F.col("nb"),
        F.lit(1e-4),
    )
    q = F.greatest(
        F.coalesce(F.col("cc"), F.lit(0)).cast("double") / F.col("nc"),
        F.lit(1e-4),
    )
    psi = cells.groupBy("event_type").agg(
        F.sum(
            F.round((q - p) * F.log(q / p), 9).cast("decimal(28,9)")
        ).alias("psi_dec")
    )
    return psi.select(
        "event_type",
        F.col("psi_dec").cast("double").alias("psi"),
        (F.col("psi_dec").cast("double") > 0.2).cast("bigint").alias(
            "flagged"
        ),
    ).orderBy("event_type")


QUERIES["psi_drift"] = q_psi_drift

ORACLE["psi_drift"] = """
    WITH base AS (
        SELECT event_type, value FROM events
        WHERE ts < TIMESTAMP '2024-01-16'
    ),
    cur AS (
        SELECT event_type,
               CASE WHEN event_type = 'click' THEN value * 2.0
                    ELSE value END AS value
        FROM events WHERE ts >= TIMESTAMP '2024-01-16'
    ),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base
    ),
    edges AS (
        SELECT ranked.event_type, list_sort(list(value)) AS e
        FROM ranked
        JOIN (SELECT unnest(range(1, 10)) AS i) di
          ON r = CAST(ceil(i * n / 10.0) AS BIGINT)
        GROUP BY 1
    ),
    bb AS (
        SELECT b.event_type,
               len(list_filter(e, x -> b.value > x)) AS bin,
               count(*) AS cb
        FROM base b JOIN edges USING (event_type) GROUP BY 1, 2
    ),
    cc AS (
        SELECT c.event_type,
               len(list_filter(e, x -> c.value > x)) AS bin,
               count(*) AS cc
        FROM cur c JOIN edges USING (event_type) GROUP BY 1, 2
    ),
    grid AS (
        SELECT event_type, CAST(unnest(range(0, 10)) AS INTEGER) AS bin
        FROM edges
    ),
    tot AS (
        SELECT b.event_type, b.nb, c.nc
        FROM (SELECT event_type, count(*) AS nb FROM base GROUP BY 1) b
        JOIN (SELECT event_type, count(*) AS nc FROM cur GROUP BY 1) c
          USING (event_type)
    ),
    cells AS (
        SELECT g.event_type,
               greatest(coalesce(cb, 0) / CAST(nb AS DOUBLE), 0.0001) AS p,
               greatest(coalesce(cc.cc, 0) / CAST(nc AS DOUBLE), 0.0001) AS q
        FROM grid g
        LEFT JOIN bb ON bb.event_type = g.event_type AND bb.bin = g.bin
        LEFT JOIN cc ON cc.event_type = g.event_type AND cc.bin = g.bin
        JOIN tot ON tot.event_type = g.event_type
    ),
    psi AS (
        SELECT event_type,
               SUM(CAST(round((q - p) * ln(q / p), 9) AS DECIMAL(28,9)))
                 AS psi_dec
        FROM cells GROUP BY 1
    )
    SELECT event_type,
           CAST(psi_dec AS DOUBLE) AS psi,
           CASE WHEN CAST(psi_dec AS DOUBLE) > 0.2 THEN 1 ELSE 0 END
             AS flagged
    FROM psi ORDER BY event_type
"""


def q_burstiness_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness screen (bot/automation detection):
    per user, the WHOLE-SECOND Fano factor (variance/mean) of
    inter-event gaps (the query's DEFINED statistic — see QUERIES.md
    "Defined statistics"; sub-second variance does not contribute,
    by design) — human-ish Poisson arrivals disperse (measured
    21k–68k s here), automation is metronomic (Fano → 0). Planted fixture: users 0–4
    get their timestamps rewritten to an exact 60 s cadence (same
    row_number rule in the oracle), so the screen must flag exactly
    those five at Fano < 100 — a ≥200× margin against the most
    regular natural user.

    Engine parity: gaps are exact integer MICROSECONDS
    (unix_micros ↔ epoch_us — NOT unix seconds, which Spark
    truncates and DuckDB fractions). All accumulators are
    INTEGER-EXACT BIGINTs — Σgap_µs for the mean, and
    second-granular moments (gap DIV 1e6) for the Fano factor — and
    the emitted doubles are unrounded IEEE derivations of those
    exact integers, so both engines produce identical bits with NO
    rounding step anywhere. The sf0.1 stress sweep caught the
    previous round(·,6) emit flipping on 33374.0610425: the double's
    exact binary value is ...0424999977 (below the half) but its
    SHORTEST DECIMAL REPR is the exact half — Spark's round goes
    through BigDecimal.valueOf(shortest repr) and rounds UP, DuckDB
    rounds the binary value DOWN. Rational ratios (µs-sums/n) produce
    shortest-repr-half doubles routinely, unlike noisy floats, so
    final rounding of exact-rational emits is banned here. Envelope proof for the squared
    sum: Σgap_sec² ≤ (Σgap_sec)·max_gap ≤ period² ≈ 6.7e12 per user
    regardless of event count — inside 2^53 at ANY corpus size.
    Millisecond moments were considered (ADVICE r10) and rejected:
    Σgap_ms² is bounded only by period_ms², which exceeds BIGINT
    (9.2e18) once a user's worst-case span passes ~35 days, and a
    DECIMAL accumulator would route the emit through the measured
    >2^53 decimal→double 1-ulp cross-engine divergence — so the
    whole-second Fano is the query's defined statistic (QUERIES.md).
    Scale: one (user, ts) window sort — the sessionize shuffle —
    then a map-side-combined per-user moment aggregate."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    from pyspark.sql import Window

    wseq = Window.partitionBy("user_id").orderBy("event_id")
    base = F.lit("2024-01-01").cast("timestamp")
    fixed = ev.select(
        "user_id",
        "event_id",
        F.when(
            F.col("user_id") < 5,
            F.timestamp_micros(
                F.unix_micros(base)
                + (F.row_number().over(wseq) - 1).cast("long") * 60_000_000
            ),
        ).otherwise(F.col("ts")).alias("ts"),
    )
    wg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = fixed.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wg)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    gap_sec = F.expr("gap_us DIV 1000000")
    agg = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("sg_us"),
        F.sum(gap_sec).alias("sg_sec"),
        F.sum(gap_sec * gap_sec).alias("sgg_sec"),
    )
    m_sec = F.col("sg_sec").cast("double") / F.col("n_gaps")
    v_sec = (
        F.col("sgg_sec").cast("double") / F.col("n_gaps") - m_sec * m_sec
    )
    # sg_sec == 0 ⟺ every gap is sub-second (truncation): a user
    # firing ≥5 events under 1 s apart IS the metronomic-automation
    # class — fano 0, flagged. Without the guard, fano = 0.0/0.0
    # crashes under ANSI (DIVIDE_BY_ZERO) and NULLs otherwise, and
    # the oracle's CASE would emit is_bot = 0 — a latent
    # data-dependent red (r10 review finding; current fixtures have
    # no such user, so the sweeps could not catch it).
    fano = F.when(F.col("sg_sec") > 0, v_sec / m_sec).otherwise(F.lit(0.0))
    return (
        agg.filter(F.col("n_gaps") >= 5)
        .select(
            "user_id",
            "n_gaps",
            (
                F.col("sg_us").cast("double")
                / F.col("n_gaps")
                / F.lit(1e6)
            ).alias("mean_gap_s"),
            fano.alias("fano"),
            (fano < 100.0).cast("bigint").alias("is_bot"),
        )
        .orderBy("user_id")
    )


QUERIES["burstiness_bots"] = q_burstiness_bots

ORACLE["burstiness_bots"] = """
    WITH fixed AS (
        SELECT user_id, event_id,
               CASE WHEN user_id < 5 THEN
                   TIMESTAMP '2024-01-01'
                   + to_microseconds(60000000 * (row_number() OVER (
                         PARTITION BY user_id ORDER BY event_id) - 1))
               ELSE ts END AS ts
        FROM events
    ),
    g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM fixed
    ),
    agg AS (
        -- integer-exact BIGINT accumulators, mirroring the Spark
        -- side: us-sum for the mean, second-granular (gap_us //
        -- 1000000) moments for Fano; the emitted doubles are
        -- unrounded IEEE derivations (a final round(double, 6)
        -- flipped on a ratio whose shortest decimal repr is an exact
        -- 6dp half while its binary value sits below it: Spark
        -- rounds the repr up, DuckDB rounds the binary value down)
        SELECT user_id, count(*) AS n_gaps,
               SUM(gap_us) AS sg_us,
               SUM(gap_us // 1000000) AS sg_sec,
               SUM((gap_us // 1000000) * (gap_us // 1000000)) AS sgg_sec
        FROM g WHERE gap_us IS NOT NULL GROUP BY 1
    )
    SELECT user_id, n_gaps,
           CAST(sg_us AS DOUBLE) / n_gaps / 1e6 AS mean_gap_s,
           -- sg_sec = 0 (all gaps sub-second) is the metronomic
           -- class: fano 0, flagged — mirrors the Spark guard
           -- (0.0/0.0 is NULL here but a DIVIDE_BY_ZERO crash under
           -- Spark ANSI)
           CASE WHEN sg_sec > 0 THEN
               (CAST(sgg_sec AS DOUBLE) / n_gaps
                - (CAST(sg_sec AS DOUBLE) / n_gaps)
                  * (CAST(sg_sec AS DOUBLE) / n_gaps))
                 / (CAST(sg_sec AS DOUBLE) / n_gaps)
           ELSE 0.0 END AS fano,
           CASE WHEN sg_sec = 0 OR
                     (CAST(sgg_sec AS DOUBLE) / n_gaps
                      - (CAST(sg_sec AS DOUBLE) / n_gaps)
                        * (CAST(sg_sec AS DOUBLE) / n_gaps))
                     / (CAST(sg_sec AS DOUBLE) / n_gaps) < 100.0
                THEN 1 ELSE 0 END AS is_bot
    FROM agg WHERE n_gaps >= 5 ORDER BY user_id
"""


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — cumulative purchase revenue per user by
    cohort age (days since the cohort's first-seen day), the
    product-analytics complement to retention_cohorts' activity
    counts: "how much has the Jan-3 cohort earned per member by day
    k". Revenue is quantized to integer CENTS via floor(x*100 + 0.5)
    (bit-deterministic on both engines, unlike round(value, 2) —
    Spark rounds the shortest decimal repr, DuckDB the binary value)
    and stays BIGINT-exact from the per-(cohort, age) rollup through
    the running-total window (cumsum order pinned by age); the fp
    divisions by 100 and cohort size happen at presentation.

    Scale: first-seen is one map-side-combined min() keyed by user;
    purchases join that user-cardinality relation (broadcast- or
    co-partition-eligible), roll up to (cohort, age) — aggregate-
    sized — and the LTV window runs at that cardinality. First-seen
    is persisted for its two consumers (revenue join + cohort
    sizes)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    from pyspark.sql import Window

    first = tracked_persist(
        ev.groupBy("user_id").agg(
            F.min(F.to_date("ts")).alias("cohort_day")
        )
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("age"),
            # cents via floor(x*100 + 0.5), NOT round(value, 2): Spark
            # rounds the double's shortest decimal repr, DuckDB its
            # binary value, so round diverges on repr-half inputs
            # (the burstiness class, pre-accumulator form — r10
            # review finding); floor of identical IEEE products is
            # bit-deterministic on both engines
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias(
                "v_cents"
            ),
        )
        .filter(F.col("age") <= 7)
    )
    daily = rev.groupBy("cohort_day", "age").agg(
        F.sum("v_cents").alias("rev_cents")
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "age",
            (
                F.sum("rev_cents").over(w).cast("double")
                / 100
                / F.col("cohort_n")
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_day", "age")
    )


QUERIES["cohort_ltv"] = q_cohort_ltv

ORACLE["cohort_ltv"] = """
    WITH first AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY 1
    ),
    rev AS (
        SELECT f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS age,
               CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS v_cents
        FROM events e JOIN first f USING (user_id)
        WHERE e.event_type = 'purchase'
          AND date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) <= 7
    ),
    daily AS (
        SELECT cohort_day, age, SUM(v_cents) AS rev_cents
        FROM rev GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_day, count(*) AS cohort_n FROM first GROUP BY 1
    )
    SELECT d.cohort_day, d.age,
           CAST(SUM(d.rev_cents) OVER (
                    PARTITION BY d.cohort_day ORDER BY d.age
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 / s.cohort_n AS ltv_per_user
    FROM daily d JOIN sizes s USING (cohort_day)
    ORDER BY 1, 2
"""
