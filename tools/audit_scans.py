"""Repeated-corpus-scan audit: count parquet scans (and sort-merge
joins) in every declared query's physical plan and flag same-table
repeats — the multi-consumer-lineage bug class found in round 7
(blockhash_near_pairs evaluated its signature chain 8×: 16 corpus
scans for one query).

A DataFrame consumed by N downstream branches re-runs its ENTIRE
lineage N times unless a materialization boundary (persist /
localCheckpoint) is placed at an aggregate- or dimension-sized
relation. At sf0.01 that's invisible in wall time; at 100 TB each
repeat is a full corpus read. The audit makes the class visible from
the plan alone.

Usage: python tools/audit_scans.py [--min-scans N]   (default 3)

Interpreting hits — not every repeat is a bug:
  - multi-TABLE joins (different files) are fine;
  - fixture unions (docs ∪ mutated twins) scan the base per branch
    by construction;
  - recall-contract queries embed a second verifier chain on purpose;
  - bucketed/range_split unions of disjoint scans ARE the operator;
  - consumers hash-partitioned on the SAME key share one exchange at
    runtime (ReusedExchange) — the "repeat" is already free.
The bug smell is the SAME table repeated because a tiny intermediate
was never pinned. A hit is a HYPOTHESIS: confirm with a same-session
A/B (tools/ab_persist.py) before shipping a persist — r8 shipped two
fixes off the raw count alone, measured them 3-10x slower
(the persist replaced free exchange reuse with a corpus-sized cache
write), and reverted. Confirmed fixes land as tracked_persist
(library cache contract) or localCheckpoint at the smallest relation
that cuts the fan-out; tests/test_plan_quality.py pins the counts.
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    min_scans = 3
    if "--min-scans" in sys.argv:
        min_scans = int(sys.argv[sys.argv.index("--min-scans") + 1])
    sf = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("audit-scans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("FATAL")
    import __spark_entry__ as m
    from lightlane_spark.plans.explain import plan_summary

    qs = m.queries()
    rows = []
    for name in sorted(qs):
        if name.startswith("streaming"):
            continue  # executes during construction
        try:
            ps = plan_summary(qs[name](spark, sf))
            tabs = collections.Counter(
                re.findall(r"([a-z_0-9]+)\.parquet", ps.text)
            )
            worst = max(tabs.values(), default=0)
            # DISTINCT scan node ids: the formatted tree prints a
            # SHARED subtree with the same node id everywhere it
            # appears, so this dedups what the mention count double-
            # counts. Still an upper bound on executed scans — it
            # cannot see runtime ReusedExchange (two consumers hash-
            # partitioned on the same key run ONE exchange), which is
            # why a hit here is a HYPOTHESIS to A/B, never a fix to
            # apply blind (r8: two "fixes" shipped off the raw count
            # measured 3-10x slower and were reverted).
            distinct_ids = len(
                set(re.findall(r"\((\d+)\) Scan parquet", ps.text))
            )
            reused = len(re.findall(r"ReusedExchange", ps.text))
            if worst >= min_scans:
                rows.append(
                    (worst, name, dict(tabs), ps.sortmerge_joins,
                     distinct_ids, reused)
                )
        except Exception as exc:  # noqa: BLE001 — report, keep auditing
            rows.append((-1, name, {"ERR": type(exc).__name__}, 0, 0, 0))
        finally:
            spark.catalog.clearCache()
    rows.sort(reverse=True)
    for worst, name, tabs, smj, distinct_ids, reused in rows:
        print(
            f"{worst:3d}  {name:32s} {tabs} smj={smj} "
            f"distinct_scan_nodes={distinct_ids} reused_exchange={reused}",
            flush=True,
        )
    print(f"-- {len(rows)} queries at >= {min_scans} same-table scans", flush=True)


if __name__ == "__main__":
    main()
