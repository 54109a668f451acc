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
