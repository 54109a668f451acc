"""Data-quality constraint checking — declarative expectations over a
DataFrame, evaluated in ONE pass (every rule becomes a conditional
aggregate; no per-rule scans).

ETL parity context: the reference validates only its own config
(modes/PKs, ``hive_loader.py:62-82``) and silently skips bad rows
(``handler/base.py:43-44``). A production load needs data-shaped
gates: not-null, uniqueness, ranges, set membership, referential
containment. ``check`` returns per-rule violation counts (one scan);
``violations`` returns the offending rows for quarantine routing
(OP-17 pattern).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Column  # True ⇒ row passes


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"range_{col}", F.col(col).between(lo, hi))


def in_set(col: str, values: list) -> Rule:
    return Rule(f"set_{col}", F.col(col).isin(values))


def matches(col: str, regex: str) -> Rule:
    return Rule(f"regex_{col}", F.col(col).rlike(regex))


def check(df: DataFrame, rules: list[Rule]) -> dict[str, int]:
    """One-pass violation counts per rule (conditional aggregates)."""
    aggs = [
        F.count(F.when(~r.predicate | r.predicate.isNull(), 1)).alias(r.name)
        for r in rules
    ]
    row = df.agg(*aggs).first()
    return {r.name: row[r.name] for r in rules}


def violations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Rows failing ≥1 rule, annotated with the failed rule names."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~r.predicate | r.predicate.isNull(), F.lit(r.name))
                for r in rules
            ]
        )
    )
    return df.withColumn("failed_rules", failed).filter(F.size("failed_rules") > 0)


def assert_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups appearing more than once (empty ⇒ unique).
    Needs a shuffle on the keys — separate from the one-pass rules."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def assert_contained(
    child: DataFrame, parent: DataFrame, fk: list[str], pk: list[str] | None = None
) -> DataFrame:
    """Referential containment: child FK values missing from the parent
    (empty ⇒ integrity holds). Anti-join; broadcast the parent keys
    when dimension-sized."""
    pk = pk or fk
    parent_keys = parent.select(*[F.col(a).alias(b) for a, b in zip(pk, fk)]).distinct()
    return child.join(parent_keys, on=fk, how="left_anti")
