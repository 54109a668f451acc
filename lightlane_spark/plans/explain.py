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
