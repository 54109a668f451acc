"""Dry-run / plan inspection — OP-36, plus plan-quality assertions the
test-suite uses to keep operators scale-honest.

The reference's dry-run (``connector/dbapi.py:10-44`` ``NullCursor``)
logs the SQL it *would* run. The Spark equivalent is the plan itself:
``dry_run`` returns the formatted physical plan without executing.

``plan_summary`` extracts the properties that matter at 100 TB —
whether filters reached the scan (PushedFilters), whether the scan
reads only needed columns (ReadSchema), which join strategies were
chosen, and how many shuffles (Exchange) the plan contains. Tests
assert on these so a regression that, say, un-broadcasts a dimension
join fails CI, not a production run.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def dry_run(df: DataFrame, mode: str = "formatted") -> str:
    """OP-36: the plan that WOULD run, without running it."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanSummary:
    text: str
    pushed_filters: list[str]
    read_schemas: list[str]
    broadcast_joins: int
    sortmerge_joins: int
    exchanges: int
    codegen_stages: int

    def scan_reads_only(self, cols: set[str]) -> bool:
        """True if every parquet scan's ReadSchema is within ``cols``."""
        for rs in self.read_schemas:
            got = set(re.findall(r"(\w+):", rs))
            if not got <= cols:
                return False
        return True


def lint_plan(df: DataFrame) -> list[str]:
    """Scale-smell linter: inspect the physical plan for the patterns
    that hurt at 100 TB and return human-readable warnings (empty list
    = clean). The rules are the ones this engine's own operators are
    tested against — run it on ad-hoc pipelines before burning cluster
    hours (``python -m lightlane_spark explain job.json`` prints the
    raw plan; this distills it).

    Rules:
      - CartesianProduct / BroadcastNestedLoopJoin: a non-equi or
        keyless join degenerated to all-pairs.
      - BatchEvalPython: row-at-a-time Python UDF in the plan (Arrow
        forms show as ArrowEvalPython / MapInPandas instead).
      - Unfiltered scan feeding a Filter: Filter nodes present while
        NO parquet scan pushed any predicate (non-deterministic or
        post-projection predicates). Note the plan omits the
        PushedFilters line entirely when nothing is pushable, so the
        rule checks for absence-of-any-pushed, not just ``[]``.
      - Expand with a wide projection list: multi-count-distinct style
        row multiplication (use approx sketches at scale).
    """
    text = dry_run(df, "formatted")
    warnings: list[str] = []
    if re.search(r"\(\d+\) CartesianProduct", text):
        warnings.append(
            "CartesianProduct: all-pairs join — add an equi-join key, "
            "block/bucket the pair space, or broadcast a genuinely tiny side"
        )
    if re.search(r"\(\d+\) BroadcastNestedLoopJoin", text):
        warnings.append(
            "BroadcastNestedLoopJoin: non-equi join replays one side per row — "
            "bin range predicates to an equi-join (operators/temporal.py) "
            "unless the broadcast side is tiny by contract"
        )
    if re.search(r"\(\d+\) BatchEvalPython", text):
        warnings.append(
            "BatchEvalPython: row-at-a-time Python UDF — rewrite with built-in "
            "expressions or an Arrow-batched pandas UDF/mapInPandas"
        )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    if (
        re.search(r"\(\d+\) Filter", text)
        and re.search(r"\(\d+\) Scan parquet", text)
        and not any(p.strip() for p in pushed)
    ):
        warnings.append(
            "Filter present but PushedFilters empty on every parquet scan — "
            "the predicate did not reach the scan (non-deterministic/cast/"
            "UDF predicate?); at 100 TB that is a full-table read"
        )
    expand = re.search(r"\(\d+\) Expand", text)
    if expand and len(re.findall(r"count\(distinct", text, re.IGNORECASE)) >= 2:
        warnings.append(
            "Expand + multiple COUNT(DISTINCT): input rows multiply per "
            "distinct aggregate — use approx_count_distinct sketches at scale"
        )
    return warnings


def plan_summary(df: DataFrame) -> PlanSummary:
    text = dry_run(df, "formatted")
    return PlanSummary(
        text=text,
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
        # count node headers "(N) Op" so tree+detail listings aren't
        # double-counted; fall back to raw mentions for simple-mode text
        broadcast_joins=len(re.findall(r"\(\d+\) BroadcastHashJoin", text))
        or len(re.findall(r"BroadcastHashJoin", text)),
        sortmerge_joins=len(re.findall(r"\(\d+\) SortMergeJoin", text)),
        exchanges=len(re.findall(r"\(\d+\) Exchange", text)),
        # NOTE: with AQE the pre-execution formatted plan carries no
        # WholeStageCodegen markers — this is only populated for plans
        # explained after execution or with AQE off.
        codegen_stages=len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text))),
    )
