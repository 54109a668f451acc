"""Skew utilities: salted join/agg equivalence + output compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lightlane_spark.operators.skew import (
    compact_output,
    salted_aggregate,
    salted_join,
    with_salt,
)


def _skewed_df(spark):
    # 90% of rows share key 1
    return spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_salt_deterministic(spark):
    df = _skewed_df(spark)
    a = with_salt(df, 8).select("k", "v", "__salt").collect()
    b = with_salt(df, 8).select("k", "v", "__salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["__salt"] < 8 for r in a)


def test_salted_join_equals_plain_join(spark):
    large = _skewed_df(spark)
    small = spark.createDataFrame(
        [(1, "hot"), (10, "ten"), (20, "twenty")], "k: bigint, name: string"
    )
    plain = large.join(small, on=["k"]).select("k", "v", "name")
    salted = salted_join(large, small, on=["k"], buckets=4).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    large = _skewed_df(spark)
    small = spark.createDataFrame([(1, "hot")], "k: bigint, name: string")
    plain = large.join(small, on=["k"], how="left").select("k", "v", "name")
    salted = salted_join(large, small, on=["k"], buckets=4, how="left").select(
        "k", "v", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"), F.count("v").alias("count_v"),
        F.min("v").alias("min_v"), F.max("v").alias("max_v"),
    )
    salted = salted_aggregate(
        df, ["k"], {"v": "sum"}, buckets=4
    ).withColumnRenamed("sum_v", "sum_v")
    p = {r.k: r.sum_v for r in plain.collect()}
    s = {r.k: r.sum_v for r in salted.collect()}
    assert p == s


def test_compact_output_file_count(spark, tmp_path):
    path = str(tmp_path / "compact")
    df = spark.range(0, 10_000).repartition(32)
    compact_output(df, path, target_files=2)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 2
    assert spark.read.parquet(path).count() == 10_000
