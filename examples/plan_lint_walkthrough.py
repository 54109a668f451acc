"""Plan-linter walkthrough: one deliberately bad pipeline per scale
smell ``lint_plan`` knows, each next to its clean rewrite — so every
lint class has a demonstrated catch AND a demonstrated fix (the
dry-run contract: nothing here executes a job; only plans are built
and inspected).

Smell classes (lightlane_spark/plans/explain.py:50):
  1. CartesianProduct          — keyless all-pairs join
  2. BroadcastNestedLoopJoin   — non-equi join replaying a side
  3. BatchEvalPython           — row-at-a-time Python UDF
  4. unpushed Filter           — predicate that never reached parquet
  5. Expand + multi COUNT(DISTINCT) — row multiplication per distinct

Run: python examples/plan_lint_walkthrough.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import LongType  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from lightlane_spark import get_spark, read_table
    from lightlane_spark.plans.explain import lint_plan

    spark = get_spark(app_name="example-plan-lint")
    spark.sparkContext.setLogLevel("ERROR")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    report: dict[str, list[str]] = {}

    def show(name: str, bad, good) -> None:
        bad_w, good_w = lint_plan(bad), lint_plan(good)
        report[name] = bad_w
        print(f"\n== {name} ==")
        for w in bad_w:
            print(f"  BAD  → {w}")
        print(f"  GOOD → {good_w or 'clean'}")
        assert bad_w, f"{name}: lint failed to fire on the bad plan"
        assert not good_w, f"{name}: lint fired on the clean rewrite: {good_w}"

    # 1. keyless join → CartesianProduct. With auto-broadcast on, a
    #    tiny side degrades to BroadcastNestedLoopJoin instead (class
    #    2 below) — disable it so the true all-pairs shape shows, the
    #    one a big×big keyless join always produces at scale. Fix:
    #    join on the real key.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        show(
            "cartesian",
            orders.crossJoin(nation.select("n_name")),
            orders.join(
                nation,
                orders["o_custkey"] % 25 == nation["n_nationkey"],
            ),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    # 2. non-equi join → BroadcastNestedLoopJoin (every orders row
    #    scans the broadcast side). Fix: bin the range predicate to an
    #    equi-key (here: the bucket both sides can agree on).
    show(
        "nested_loop",
        orders.join(nation, orders["o_custkey"] > nation["n_nationkey"]),
        orders.withColumn("b", F.col("o_custkey") % 25).join(
            F.broadcast(nation.withColumn("b", F.col("n_nationkey"))), "b"
        ),
    )

    # 3. row-at-a-time Python UDF → BatchEvalPython. Fix: the same
    #    arithmetic as a built-in JVM expression.
    plus_one = F.udf(lambda x: x + 1, LongType())
    show(
        "python_udf",
        orders.select(plus_one(F.col("o_orderkey")).alias("k")),
        orders.select((F.col("o_orderkey") + 1).alias("k")),
    )

    # 4. non-deterministic predicate → Filter node while the scan
    #    pushed nothing (rand() can never reach parquet; the plan
    #    omits the PushedFilters line entirely). Fix: filter on a
    #    stored column — the predicate lands in the scan and prunes
    #    row groups by min/max statistics.
    show(
        "unpushed_filter",
        orders.filter(F.rand(7) < 0.5).select("o_orderkey"),
        orders.filter(F.col("o_totalprice") > 1000).select("o_orderkey"),
    )

    # 5. several exact COUNT(DISTINCT) → Expand multiplies every input
    #    row per aggregate. Fix at scale: HLL sketches, one pass.
    show(
        "multi_distinct",
        orders.agg(
            F.countDistinct("o_orderkey"),
            F.countDistinct("o_custkey"),
            F.countDistinct("o_orderstatus"),
        ),
        orders.agg(
            F.approx_count_distinct("o_orderkey"),
            F.approx_count_distinct("o_custkey"),
            F.approx_count_distinct("o_orderstatus"),
        ),
    )

    print(f"\nall {len(report)} lint classes fired and their rewrites are clean")
    return report


if __name__ == "__main__":
    main(*sys.argv[1:2])
