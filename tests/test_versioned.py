"""Versioned loads (time travel / rollback / vacuum) and schema
evolution on MERGE."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lightlane_spark.loaders.loader import Loader, align_schemas, merge_upsert
from lightlane_spark.loaders.versioned import VersionedTable
from lightlane_spark.sources.parquet import read_table


def test_versioned_write_merge_timetravel(spark, sf_dir, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "orders_v"))
    orders = read_table(spark, sf_dir, "orders")
    v1 = vt.write_version(orders)
    assert v1 == 1 and vt.latest_version() == 1

    staging = orders.filter("o_orderkey % 3 = 0").withColumn(
        "o_orderpriority", F.lit("MERGED")
    )
    v2 = vt.merge_version(staging, ["o_orderkey"])
    assert v2 == 2 and vt.latest_version() == 2

    # latest reflects the merge; v1 is untouched (time travel)
    assert vt.read().filter("o_orderpriority = 'MERGED'").count() == staging.count()
    assert vt.read(1).filter("o_orderpriority = 'MERGED'").count() == 0
    assert vt.read(1).count() == vt.read(2).count() == orders.count()


def test_versioned_rollback_and_vacuum(spark, sf_dir, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    base = spark.range(10).withColumn("val", F.col("id") * 2)
    vt.write_version(base)
    vt.write_version(base.withColumn("val", F.col("val") + 1))
    vt.write_version(base.withColumn("val", F.col("val") + 2))
    assert vt.versions() == [1, 2, 3]

    vt.rollback(2)
    assert vt.latest_version() == 2
    assert vt.read().agg(F.sum("val")).first()[0] == base.agg(
        F.sum(F.col("val") + 1)
    ).first()[0]
    with pytest.raises(ValueError):
        vt.rollback(99)

    # vacuum keeps the pointer target even when outside keep_last
    removed = vt.vacuum(keep_last=1)
    assert 1 in removed and 2 not in removed and 3 not in removed
    assert vt.read().count() == 10


def test_merge_schema_evolution(spark, tmp_path):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "pk bigint, val string"
    )
    staging = spark.createDataFrame(
        [(2, "b2", 9.5), (3, "c", 1.0)], "pk bigint, val string, score double"
    )
    # default: loud failure on drift
    with pytest.raises(Exception):
        merge_upsert(target, staging, ["pk"]).collect()
    merged = merge_upsert(target, staging, ["pk"], schema_evolution=True)
    rows = {r.pk: (r.val, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b2", 9.5), 3: ("c", 1.0)}

    # dropped column: upserted rows carry NULL, retained rows keep data
    staging2 = spark.createDataFrame([(1, 7.0)], "pk bigint, score double")
    merged2 = merge_upsert(merged, staging2, ["pk"], schema_evolution=True)
    rows2 = {r.pk: (r.val, r.score) for r in merged2.collect()}
    assert rows2[1] == (None, 7.0) and rows2[2] == ("b2", 9.5)

    # conflicting types refuse to merge
    bad = spark.createDataFrame([(1, 5)], "pk bigint, val bigint")
    with pytest.raises(ValueError, match="conflicting types"):
        align_schemas(target, bad)


def test_loader_merge_schema_evolution_end_to_end(spark, sf_dir, tmp_path):
    path = str(tmp_path / "evolving")
    orders = read_table(spark, sf_dir, "orders")
    Loader(spark, path, "overwrite").execute(orders)
    staging = (
        orders.filter("o_orderkey % 5 = 0")
        .withColumn("ingest_tag", F.lit("batch2"))
    )
    Loader(
        spark, path, "merge", primary_keys=["o_orderkey"], schema_evolution=True
    ).execute(staging)
    back = spark.read.parquet(path)
    assert "ingest_tag" in back.columns
    assert back.filter("ingest_tag = 'batch2'").count() == staging.count()
    assert back.filter("ingest_tag IS NULL").count() == orders.count() - staging.count()
