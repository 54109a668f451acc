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


# the name class must cover catalog-qualified scans
# ("Scan parquet spark_catalog.default.orders") — with dots excluded
# the node silently dropped out of the tree, and a Filter above it
# escaped the unpushed-filter rule whenever ANOTHER scan in the plan
# parsed (the no-scan-parsed fallback below only fires when NO scan
# survives parsing)
_TREE_NODE = re.compile(
    r"^([ +:|\\-]*)\*?\s*(?:\((\d+)\)\s*)?([A-Za-z][\w .$`#-]*?)\s*(?:\((\d+)\))?\s*$"
)
# nodes that legitimately produce rows a scan-level predicate cannot
# see (so a Filter above them is a HAVING/post-transform filter, not
# an unpushed scan predicate)
_BARRIER = re.compile(
    r"^(HashAggregate|SortAggregate|ObjectHashAggregate|Window|"
    r"WindowGroupLimit|Generate|Expand|MapInPandas|FlatMapGroupsInPandas|"
    r"ArrowEvalPython|BatchEvalPython|AggregateInPandas)\b"
)


def _filter_over_raw_scan(text: str) -> bool:
    """True iff some Filter node in the formatted plan TREE reaches a
    parquet scan downward without crossing an aggregation/window/
    generator barrier — i.e. a filter whose predicate plausibly COULD
    have been pushed to the scan. A plan whose only Filters sit above
    an Aggregate (HAVING-style) has nothing pushable by construction
    and must not trip the unpushed-filter lint (r10 ADVICE #4's
    false-positive class)."""
    lines = text.splitlines()
    # tree section = lines between "== Physical Plan ==" and the
    # first blank line; each line's depth is the column where the
    # node name starts (formatted mode indents 3 per level)
    try:
        start = next(
            i for i, ln in enumerate(lines) if ln.startswith("== Physical Plan")
        )
    except StopIteration:
        return True  # unknown layout: keep the old (conservative) behavior
    nodes: list[tuple[int, str]] = []  # (depth, name)
    for ln in lines[start + 1 :]:
        if not ln.strip():
            break
        m = _TREE_NODE.match(ln)
        if not m:
            continue
        depth = len(m.group(1))
        name = m.group(3).strip()
        nodes.append((depth, name))
    # conservative fallback (avoid lint false-NEGATIVES): if the main
    # tree shows no parquet scan but the full text does, the scan
    # lives in a "===== Subqueries =====" section this parser does
    # not walk — keep the old whole-text behavior and let the rule
    # fire
    if not any(
        n.startswith(("Scan parquet", "BatchScan")) for _, n in nodes
    ) and re.search(r"\(\d+\) Scan parquet", text):
        return True

    # ReusedExchange hides the scan subtree it points at — treat it
    # as scan-reaching so a Filter above a reused raw-scan exchange
    # still trips the rule
    def is_scan_like(n: str) -> bool:
        return n.startswith(("Scan parquet", "BatchScan", "ReusedExchange"))

    for i, (d, name) in enumerate(nodes):
        if not name.startswith("Filter"):
            continue
        # walk the Filter's subtree; for each scan found, the path
        # back up to the Filter is the chain of strictly-shallower
        # preceding nodes — barrier-free path ⇒ raw-scan filter
        path: list[tuple[int, str]] = []  # current ancestor stack below the Filter
        for dj, nj in nodes[i + 1 :]:
            if dj <= d:
                break
            while path and path[-1][0] >= dj:
                path.pop()
            if is_scan_like(nj):
                if not any(_BARRIER.match(p[1]) for p in path):
                    return True
            path.append((dj, nj))
    return False


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
        Scoped to Filters whose tree path down to a parquet scan
        crosses no aggregate/window/generator: a HAVING-style filter
        above an Aggregate has nothing pushable by construction and
        does not fire the rule. Advisory residual: a Filter above a
        join fires if EITHER join input reaches a scan barrier-free,
        even when the predicate only references the other side.
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
        and _filter_over_raw_scan(text)
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
