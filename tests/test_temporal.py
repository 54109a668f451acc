"""Temporal operators: as-of join, binned range join, time rollup."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lightlane_spark.operators.temporal import (
    asof_join,
    range_join_binned,
    time_rollup,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, price): the classic trades/quotes as-of fixture
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 1.0),
            ("a", _ts("2024-01-01T10:00:05"), 2.0),
            ("a", _ts("2024-01-01T10:00:10"), 3.0),
            ("b", _ts("2024-01-01T10:00:03"), 10.0),
        ],
        "sym string, ts timestamp, price double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00:04")),
            (2, "a", _ts("2024-01-01T10:00:05")),  # equal-ts: inclusive match
            (3, "a", _ts("2024-01-01T09:59:00")),  # before any quote
            (4, "b", _ts("2024-01-01T10:00:07")),
            (5, "c", _ts("2024-01-01T10:00:07")),  # key with no quotes
        ],
        "trade_id long, sym string, ts timestamp",
    )


def _rows(df, cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_asof_backward(trades, quotes):
    out = asof_join(trades, quotes, "ts", ["sym"], ["price"])
    assert _rows(out, ["trade_id", "price"]) == {
        (1, 1.0),  # latest quote <= 10:00:04 is 10:00:00
        (2, 2.0),  # equal timestamp matches
        (3, None),  # no earlier quote
        (4, 10.0),
        (5, None),  # no quotes for key at all
    }
    # matched timestamp surfaces as __asof_ts
    m = {r["trade_id"]: r["__asof_ts"] for r in out.collect()}
    assert m[2] == _ts("2024-01-01T10:00:05")


def test_asof_forward(trades, quotes):
    out = asof_join(trades, quotes, "ts", ["sym"], ["price"], direction="forward")
    assert _rows(out, ["trade_id", "price"]) == {
        (1, 2.0),  # next quote >= 10:00:04 is 10:00:05
        (2, 2.0),  # equal timestamp matches forward too
        (3, 1.0),
        (4, None),  # no later quote
        (5, None),
    }


def test_asof_tolerance(trades, quotes):
    out = asof_join(
        trades, quotes, "ts", ["sym"], ["price"], tolerance_seconds=2.0
    )
    # trade 1 (gap 4s from 10:00:00 quote) is nulled; trade 2 (gap 0) kept
    assert _rows(out, ["trade_id", "price"]) == {
        (1, None),
        (2, 2.0),
        (3, None),
        (4, None),  # gap 4s > 2s
        (5, None),
    }


def test_asof_keeps_left_columns_and_count(trades, quotes):
    out = asof_join(trades, quotes, "ts", ["sym"], ["price"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"trade_id", "sym", "ts", "__asof_ts", "price"}


def test_asof_rejects_bad_direction(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, "ts", ["sym"], ["price"], direction="nearest")


def test_range_join_binned_matches_naive(spark):
    points = spark.range(0, 100).select(
        F.col("id").alias("pid"), (F.col("id") * 1.37).alias("v")
    )
    ivals = spark.createDataFrame(
        [(0, 5.0, 20.0), (1, 19.5, 21.0), (2, 80.0, 200.0), (3, -10.0, -1.0)],
        "ival_id long, lo double, hi double",
    )
    got = _rows(
        range_join_binned(points, ivals, "v", "lo", "hi", bin_width=7.0),
        ["pid", "ival_id"],
    )
    naive = _rows(
        points.crossJoin(ivals).filter(F.col("v").between(F.col("lo"), F.col("hi"))),
        ["pid", "ival_id"],
    )
    assert got == naive and len(got) > 0
    # bounds are inclusive on both ends
    pts = spark.createDataFrame([(1, 5.0), (2, 20.0)], "pid long, v double")
    one = spark.createDataFrame([(9, 5.0, 20.0)], "ival_id long, lo double, hi double")
    assert _rows(
        range_join_binned(pts, one, "v", "lo", "hi", bin_width=4.0), ["pid"]
    ) == {(1,), (2,)}


def test_time_rollup_one_shuffle_all_grains(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:15:00"), 1.0),
            (2, _ts("2024-01-01T10:45:00"), 2.0),
            (3, _ts("2024-01-01T11:05:00"), 4.0),
            (4, _ts("2024-01-02T00:30:00"), 8.0),
        ],
        "id long, ts timestamp, value double",
    )
    out = time_rollup(
        ev, "ts", ["hour", "day"], [F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")]
    )
    # one shuffle total, for all grains: a single Exchange in the plan
    # (summarized pre-execution — an executed AQE plan prints its
    # Initial Plan section too and would double-count)
    from lightlane_spark.plans.explain import plan_summary

    assert plan_summary(out).exchanges == 1
    got = {(r["grain"], r["bucket"].isoformat(), r["n"], r["s"]) for r in out.collect()}
    assert got == {
        ("hour", "2024-01-01T10:00:00", 2, 3.0),
        ("hour", "2024-01-01T11:00:00", 1, 4.0),
        ("hour", "2024-01-02T00:00:00", 1, 8.0),
        ("day", "2024-01-01T00:00:00", 3, 7.0),
        ("day", "2024-01-02T00:00:00", 1, 8.0),
    }


def test_asof_plan_has_no_join(trades, quotes):
    """The scale contract: as-of is window-based, not a join."""
    from lightlane_spark.plans.explain import plan_summary

    s = plan_summary(asof_join(trades, quotes, "ts", ["sym"], ["price"]))
    assert "Join" not in s.text
    assert s.exchanges == 1


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized (seeded) cross-check against pandas.merge_asof —
    an independent implementation of as-of semantics — in both
    directions, including unmatched rows and equal timestamps."""
    import random

    import pandas as pd

    rng = random.Random(42)
    for case in range(5):
        base = dt.datetime(2024, 1, 1)
        lrows = [
            (
                i,
                rng.choice("abc"),
                base + dt.timedelta(seconds=rng.randrange(0, 500)),
            )
            for i in range(30)
        ]
        seen, rrows = set(), []
        for _ in range(20):
            key = rng.choice("abcd")
            ts = base + dt.timedelta(seconds=rng.randrange(0, 500))
            if (key, ts) not in seen:  # right unique per (by, ts)
                seen.add((key, ts))
                rrows.append((key, ts, float(len(seen))))
        left = spark.createDataFrame(lrows, "lid long, k string, ts timestamp")
        right = spark.createDataFrame(rrows, "k string, ts timestamp, val double")
        lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
        rpd = pd.DataFrame(rrows, columns=["k", "ts", "val"]).sort_values("ts")
        for direction in ("backward", "forward"):
            got = {
                (r.lid, r.val)
                for r in asof_join(
                    left, right, "ts", ["k"], ["val"], direction=direction
                ).collect()
            }
            exp_pd = pd.merge_asof(
                lpd, rpd, on="ts", by="k", direction=direction
            )
            exp = {
                (int(r.lid), None if pd.isna(r.val) else float(r.val))
                for r in exp_pd.itertuples()
            }
            assert got == exp, f"case {case} direction {direction}"


def test_resample_fill_densifies_and_fills(spark):
    """Gaps inside each key's span appear with zero-filled counts and
    forward-filled values; the grid never extends beyond the span."""
    import datetime as dt

    from lightlane_spark.operators.temporal import resample_fill

    rows = [
        ("a", dt.datetime(2024, 1, 1, 9), 10.0),
        ("a", dt.datetime(2024, 1, 1, 17), 20.0),
        ("a", dt.datetime(2024, 1, 4, 12), 5.0),   # 2-day gap before
        ("b", dt.datetime(2024, 1, 2, 0), 7.0),    # single observation
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = resample_fill(
        df,
        "ts",
        ["k"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
        ],
        freq="day",
        zero_fill=["n"],
        forward_fill=["sv"],
    ).orderBy("k", "bucket")
    got = [(r.k, r.bucket.day, r.n, r.sv) for r in out.collect()]
    assert got == [
        ("a", 1, 2, 30.0),
        ("a", 2, 0, 30.0),   # gap: count 0, sum forward-filled
        ("a", 3, 0, 30.0),
        ("a", 4, 1, 5.0),
        ("b", 2, 1, 7.0),    # span is one day — no padding beyond
    ]


# ---------------------------------------------------------------------------
# Two-phase global running sum + sweep-line concurrency
# ---------------------------------------------------------------------------


def test_global_running_sum_matches_single_window(spark):
    """Two-phase (per-bucket + broadcast offsets) must equal the naive
    global window on a fixture whose buckets are deliberately uneven
    (some empty days, one day holding most rows)."""
    import datetime as dt

    from pyspark.sql import Window

    from lightlane_spark.operators.temporal import global_running_sum

    rows = [
        (dt.datetime(2024, 1, 1, h, m), v)
        for h, m, v in [(0, 0, 5), (0, 30, -2), (23, 59, 7)]
    ] + [
        (dt.datetime(2024, 1, 4, 12, 0), 100),
        (dt.datetime(2024, 1, 4, 12, 1), -50),
        (dt.datetime(2024, 1, 9, 0, 0), 1),
    ]
    df = spark.createDataFrame(rows, "t: timestamp, v: long")
    got = {
        r.t: r.running
        for r in global_running_sum(
            df, "t", "v", F.date_trunc("day", F.col("t"))
        ).collect()
    }
    naive = {
        r.t: r.run
        for r in df.withColumn(
            "run", F.sum("v").over(Window.orderBy("t"))
        ).collect()
    }
    assert got == naive


def test_sweep_line_half_open_touching_intervals(spark):
    """[10:00, 11:00) and [11:00, 12:00) never overlap: max
    concurrency stays 1. A genuinely overlapping third interval
    raises it to 2."""
    import datetime as dt

    from lightlane_spark.operators.temporal import sweep_line_concurrency

    d = dt.datetime
    df = spark.createDataFrame(
        [
            (d(2024, 1, 1, 10), d(2024, 1, 1, 11)),
            (d(2024, 1, 1, 11), d(2024, 1, 1, 12)),
        ],
        "s: timestamp, e: timestamp",
    )
    out = sweep_line_concurrency(df, "s", "e", grain="day").collect()
    assert len(out) == 1 and out[0].max_concurrency == 1

    df2 = df.union(
        spark.createDataFrame(
            [(d(2024, 1, 1, 10, 30), d(2024, 1, 1, 11, 30))],
            "s: timestamp, e: timestamp",
        )
    )
    out2 = sweep_line_concurrency(df2, "s", "e", grain="day").collect()
    assert len(out2) == 1 and out2[0].max_concurrency == 2
