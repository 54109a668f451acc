"""End-to-end Pipeline API (the reference's three entry points)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from lightlane_spark.pipeline import Pipeline


def test_dump_pipeline_csv_and_parquet(spark, sf_dir, tmp_path):
    """Entry point 1 (dump): extract → transform → fan-out sinks."""
    csv_path = str(tmp_path / "csv")
    pq_path = str(tmp_path / "pq")
    metrics = (
        Pipeline(spark)
        .extract_parquet(
            sf_dir, "lineitem",
            columns=["l_orderkey", "l_quantity", "l_returnflag"],
            where="l_quantity > 30",
            splitby="l_orderkey", splits=4,
        )
        .transform(lambda df: df.withColumn("qty2", F.col("l_quantity") * 2))
        .to_csv(csv_path)
        .to_parquet(pq_path)
        .run()
    )
    assert metrics["extracted"]["rows"] > 0
    back = spark.read.parquet(pq_path)
    assert back.count() == metrics["extracted"]["rows"]
    assert "qty2" in back.columns
    assert os.path.isdir(csv_path)


def test_load_pipeline_with_dedup_and_merge(spark, sf_dir, tmp_path):
    """Entry points 2/3 (load): staging → dedup → MERGE into target."""
    target = str(tmp_path / "t")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    Pipeline(spark).extract_df(orders).load(target, "overwrite").run()
    modified = orders.filter("o_orderkey % 3 = 0").withColumn(
        "o_orderpriority", F.lit("NEW")
    )
    staging = modified.unionByName(modified)  # exact dup rows in staging
    Pipeline(spark).extract_df(staging).load(
        target,
        "merge",
        primary_keys=["o_orderkey"],
        dedup=True,
        dedup_uniq_keys=["o_orderkey"],
        dedup_orderby=["o_orderpriority"],
    ).run()
    back = spark.read.parquet(target)
    assert back.count() == orders.count()
    assert back.filter("o_orderpriority = 'NEW'").count() == orders.filter(
        "o_orderkey % 3 = 0"
    ).count()


def test_quarantine_routing(spark, tmp_path):
    bad_path = str(tmp_path / "bad")
    good_path = str(tmp_path / "good")
    df = spark.createDataFrame(
        [(1, '{"k":1}'), (2, "garbage"), (3, '{"k":3}')], "id: bigint, payload: string"
    )
    m = (
        Pipeline(spark)
        .extract_df(df)
        .quarantine(F.get_json_object("payload", "$.k").isNotNull())
        .to_parquet(good_path)
        .bad_to_parquet(bad_path)
        .run()
    )
    assert spark.read.parquet(good_path).count() == 2
    assert spark.read.parquet(bad_path).count() == 1
    assert m["quarantined"]["rows"] == 1 and m["good"]["rows"] == 2


def test_pipeline_validation():
    with pytest.raises(ValueError):
        Pipeline(None).transform(lambda d: d)
    with pytest.raises(ValueError):
        Pipeline(None).run()
