"""Snapshot diff / apply-changes (CDC)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lightlane_spark.operators.cdc import apply_changes, snapshot_diff


@pytest.fixture()
def snapshots(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "pk: bigint, name: string, v: int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 30), (5, "e", 50)],
        "pk: bigint, name: string, v: int",
    )
    return old, new


def test_snapshot_diff_classification(spark, snapshots):
    old, new = snapshots
    d = {r.pk: r["__change"] for r in snapshot_diff(old, new, ["pk"]).collect()}
    assert d == {1: "unchanged", 2: "update", 3: "update", 4: "delete", 5: "insert"}


def test_delete_rows_carry_old_values(spark, snapshots):
    old, new = snapshots
    row = (
        snapshot_diff(old, new, ["pk"]).filter("pk = 4").first()
    )
    assert row.name == "d" and row.v == 40


def test_apply_changes_roundtrip(spark, snapshots):
    """old + diff(old→new) == new, exactly."""
    old, new = snapshots
    diff = snapshot_diff(old, new, ["pk"])
    replayed = apply_changes(old, diff, ["pk"])
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, new.collect()))


def test_diff_requires_pks(snapshots):
    old, new = snapshots
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [])


def test_scd2_apply_versions(spark):
    from lightlane_spark.operators.cdc import OPEN_END, scd2_apply
    import datetime as dt

    open_end = "2200-01-01 00:00:00"
    hist = spark.createDataFrame(
        [
            (1, "a", "2020-01-01 00:00:00", open_end),     # open, will change
            (2, "b", "2020-01-01 00:00:00", open_end),     # open, unchanged
            (3, "old", "2019-01-01 00:00:00", "2020-01-01 00:00:00"),  # closed
            (3, "new", "2020-01-01 00:00:00", open_end),   # open, no update
        ],
        "k bigint, v string, valid_from string, valid_to string",
    ).selectExpr("k", "v", "CAST(valid_from AS TIMESTAMP) valid_from", "CAST(valid_to AS TIMESTAMP) valid_to")
    upd = spark.createDataFrame(
        [(1, "a2"), (2, "b"), (9, "fresh")], "k bigint, v string"
    )
    out = scd2_apply(hist, upd, ["k"], "2024-06-01 00:00:00").collect()
    rows = {(r.k, r.v): (str(r.valid_from), str(r.valid_to)) for r in out}
    assert len(out) == 6
    # key 1: closed-out old version + new open version
    assert rows[(1, "a")] == ("2020-01-01 00:00:00", "2024-06-01 00:00:00")
    assert rows[(1, "a2")] == ("2024-06-01 00:00:00", open_end)
    # key 2: no-op update leaves the open row untouched (idempotency)
    assert rows[(2, "b")][1] == open_end
    # key 3: closed history untouched, open row untouched
    assert rows[(3, "old")][1] == "2020-01-01 00:00:00"
    assert rows[(3, "new")][1] == open_end
    # key 9: brand-new key inserted open
    assert rows[(9, "fresh")] == ("2024-06-01 00:00:00", open_end)
    # re-applying the same batch changes nothing
    out2 = scd2_apply(
        spark.createDataFrame(out, schema=hist.schema), upd, ["k"], "2024-07-01 00:00:00"
    ).collect()
    assert len(out2) == 6
    assert OPEN_END == open_end
