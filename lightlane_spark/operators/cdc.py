"""Snapshot diff / change-data-capture between table versions.

The reference's only incremental mechanism is MERGE upsert (OP-27) —
it can apply a batch but cannot tell you what changed. ``snapshot_diff``
closes the loop: given two snapshots keyed by primary keys, classify
every row as insert / update / delete / unchanged. One full-outer join
on the PKs (shuffle both sides — or zero shuffle when both snapshots
are bucketed on the PK, loaders/bucketing.py).

``apply_changes`` replays a diff onto a target — so extract-diff-apply
moves only the changed rows across the wire, the pattern that matters
when the 100 TB table changes 0.1% per day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "__change"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    primary_keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify rows between snapshots → new-side columns plus
    ``__change`` ∈ {insert, update, delete, unchanged}.

    For deletes the non-PK columns carry the OLD values (the new side
    has none). ``compare_cols`` defaults to all non-PK columns.
    """
    if not primary_keys:
        raise ValueError("snapshot_diff requires primary_keys")
    value_cols = compare_cols or [c for c in new.columns if c not in primary_keys]
    o = old.select(
        *[F.col(k) for k in primary_keys],
        *[F.col(c).alias(f"__old_{c}") for c in value_cols],
    )
    n = new.select(
        *[F.col(k) for k in primary_keys],
        *[F.col(c).alias(f"__new_{c}") for c in value_cols],
    ).withColumn("__in_new", F.lit(True))
    o = o.withColumn("__in_old", F.lit(True))
    j = o.join(n, on=primary_keys, how="full_outer")
    # NULL-safe comparison: a value changing to/from NULL is an update
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), "insert")
        .when(F.col("__in_new").isNull(), "delete")
        .when(changed, "update")
        .otherwise("unchanged")
    )
    out_vals = [
        F.when(F.col("__in_new").isNull(), F.col(f"__old_{c}"))
        .otherwise(F.col(f"__new_{c}"))
        .alias(c)
        for c in value_cols
    ]
    return j.select(*primary_keys, *out_vals, change.alias(CHANGE_COL))


def apply_changes(
    target: DataFrame, diff: DataFrame, primary_keys: list[str]
) -> DataFrame:
    """Replay a diff: delete removed PKs, upsert inserts+updates.
    Returns the new target content (write it with Loader)."""
    dels = diff.filter(F.col(CHANGE_COL) == "delete").select(*primary_keys)
    ups = diff.filter(F.col(CHANGE_COL).isin("insert", "update")).drop(CHANGE_COL)
    kept = target.join(
        dels.unionByName(ups.select(*primary_keys)), on=primary_keys, how="left_anti"
    )
    return kept.unionByName(ups)
