#!/usr/bin/env python
"""Interleaved A/B: kcore_peel round shape (r14, VERDICT ask #3).

A = current shape: long (a,b,id) relation, two windows per round
    (count over id, min over (a,b)), per-round lazy localCheckpoint.
B = degree-aggregate + anti-join shape: per round ONE map-side-combined
    groupBy(id) degree aggregate, peeled ids (deg < k) removed from the
    edge set via two equi anti-joins (AQE picks broadcast when the
    peeled set is small — every round after the first on real graphs).

Both produce (id, deg-in-peeled-graph); results compared exactly.
Schedule per rep: A, B, A, B ... in ONE session over the SAME input
graph so box drift lands on both.

Run: python tools/r14/ab_kcore.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lightlane_spark.cache import unpersist_all  # noqa: E402
from lightlane_spark.session import get_spark  # noqa: E402


def kcore_A(edges: DataFrame, k: int = 3, rounds: int = 4) -> DataFrame:
    e = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).distinct()
    long = e.select("a", "b", F.explode(F.array("a", "b")).alias("id")).localCheckpoint(
        eager=False
    )
    for _ in range(rounds):
        long = (
            long.withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("id")))
            .withColumn("mindeg", F.min("deg").over(Window.partitionBy("a", "b")))
            .filter(F.col("mindeg") >= k)
            .drop("deg", "mindeg")
            .localCheckpoint(eager=False)
        )
    return long.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))


def kcore_B(edges: DataFrame, k: int = 3, rounds: int = 4) -> DataFrame:
    e = (
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        bad = (
            e.select(F.explode(F.array("a", "b")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") < k)
            .select("id")
            .localCheckpoint(eager=False)
        )
        e = (
            e.join(bad.select(F.col("id").alias("__pa")), F.col("a") == F.col("__pa"), "left_anti")
            .join(bad.select(F.col("id").alias("__pb")), F.col("b") == F.col("__pb"), "left_anti")
            .localCheckpoint(eager=False)
        )
    return (
        e.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-kcore")
    spark.sparkContext.setLogLevel("ERROR")
    from lightlane_spark.queries_m5 import _neardup_pairs

    # result equality first (exact rows)
    pairs = _neardup_pairs(spark, sf_dir)
    ra = sorted(map(tuple, kcore_A(pairs).collect()))
    unpersist_all()
    spark.catalog.clearCache()
    pairs = _neardup_pairs(spark, sf_dir)
    rb = sorted(map(tuple, kcore_B(pairs).collect()))
    unpersist_all()
    spark.catalog.clearCache()
    print(f"rows A={len(ra)} B={len(rb)} equal={ra == rb}", flush=True)
    if ra != rb:
        sys.exit(1)

    ta, tb = [], []
    for rep in range(reps):
        for name, fn, acc in (("A", kcore_A, ta), ("B", kcore_B, tb)):
            t0 = time.perf_counter()
            fn(_neardup_pairs(spark, sf_dir)).count()
            acc.append(time.perf_counter() - t0)
            unpersist_all()
            spark.catalog.clearCache()
        print(
            f"rep{rep}: A={ta[-1]:.3f} B={tb[-1]:.3f}",
            flush=True,
        )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"A median={med(ta):.3f} best={min(ta):.3f}")
    print(f"B median={med(tb):.3f} best={min(tb):.3f}")


if __name__ == "__main__":
    main()
