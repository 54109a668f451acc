"""OP-24..OP-31 — loader modes, dedup-before-merge, partitioned writes."""

from __future__ import annotations

import os

import pytest

from lightlane_spark.loaders.loader import Loader, LoadMode, merge_upsert
from lightlane_spark.operators.dedup import dedup_keep_first


@pytest.fixture
def target_staging(spark):
    target = spark.createDataFrame(
        [(1, "a", "t1", 1), (2, "a", "t2", 1), (3, "b", "t3", 1)],
        "pk1: bigint, pk2: string, val: string, ver: int",
    )
    staging = spark.createDataFrame(
        [(2, "a", "s2", 2), (4, "c", "s4", 2)],
        "pk1: bigint, pk2: string, val: string, ver: int",
    )
    return target, staging


def test_merge_upsert_multicol_pk(target_staging):
    target, staging = target_staging
    out = merge_upsert(target, staging, ["pk1", "pk2"]).orderBy("pk1").collect()
    assert [(r.pk1, r.val) for r in out] == [(1, "t1"), (2, "s2"), (3, "t3"), (4, "s4")]


def test_loader_modes_roundtrip(spark, tmp_path, target_staging):
    target, staging = target_staging
    path = str(tmp_path / "t")
    Loader(spark, path, LoadMode.OVERWRITE).execute(target)
    assert spark.read.parquet(path).count() == 3
    Loader(spark, path, LoadMode.APPEND).execute(staging)
    assert spark.read.parquet(path).count() == 5
    Loader(spark, path, LoadMode.OVERWRITE).execute(target)
    Loader(spark, path, LoadMode.MERGE, primary_keys=["pk1", "pk2"]).execute(staging)
    rows = {(r.pk1, r.val) for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "t1"), (2, "s2"), (3, "t3"), (4, "s4")}


def test_merge_creates_missing_target(spark, tmp_path, target_staging):
    _, staging = target_staging
    path = str(tmp_path / "new")
    Loader(spark, path, "merge", primary_keys=["pk1"]).execute(staging)
    assert spark.read.parquet(path).count() == 2


def test_merge_validation():
    with pytest.raises(ValueError):
        Loader(None, "/x", LoadMode.MERGE)  # no PKs — hive_loader.py:67-69
    with pytest.raises(ValueError):
        Loader(None, "/x", "merge", primary_keys=["a"], partition_by=["dt"])
    with pytest.raises(ValueError):
        Loader(None, "/x", "overwrite", dedup=True)  # keys required


def test_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "x", 3, "v3"), (1, "x", 1, "v1"), (2, "y", 5, "v5"), (1, "x", 3, "v3b")],
        "uk1: bigint, uk2: string, ver: int, val: string",
    )
    from pyspark.sql import functions as F

    out = dedup_keep_first(df, ["uk1", "uk2"], [F.col("ver").desc()]).orderBy("uk1").collect()
    assert len(out) == 2
    assert out[0].ver == 3 and out[0].val == "v3"  # deterministic tie-break: val asc
    assert out[1].val == "v5"


def test_dedup_before_merge_ordering(spark, tmp_path):
    """Staging dedup happens BEFORE the upsert (hive_loader.py:184-187)."""
    path = str(tmp_path / "m")
    target = spark.createDataFrame([(1, 0, "t")], "pk: bigint, ver: int, val: string")
    staging = spark.createDataFrame(
        [(1, 2, "new"), (1, 1, "old")], "pk: bigint, ver: int, val: string"
    )
    Loader(spark, path, "overwrite").execute(target)
    Loader(
        spark,
        path,
        "merge",
        primary_keys=["pk"],
        dedup=True,
        dedup_uniq_keys=["pk"],
        dedup_orderby=["ver"],
    ).execute(staging)
    rows = spark.read.parquet(path).collect()
    # dedup default keeps row_number()=1 under orderby asc → ver=1
    assert len(rows) == 1 and rows[0].ver == 1


def test_partitioned_write(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "2025-01-01"), (2, "2025-01-02")], "id: bigint, dt: string"
    )
    Loader(spark, path, "overwrite", partition_by=["dt"]).execute(df)
    assert os.path.isdir(os.path.join(path, "dt=2025-01-01"))
    assert spark.read.parquet(path).count() == 2


def test_pre_post_sql_hooks(spark, tmp_path):
    path = str(tmp_path / "h")
    df = spark.createDataFrame([(1,)], "id: bigint")
    Loader(
        spark,
        path,
        "overwrite",
        pre_sql=["CREATE OR REPLACE TEMP VIEW _pre_hook AS SELECT 1 AS ok"],
        post_sql=["CREATE OR REPLACE TEMP VIEW _post_hook AS SELECT 2 AS ok"],
    ).execute(df)
    assert spark.table("_pre_hook").first().ok == 1
    assert spark.table("_post_hook").first().ok == 2


def test_loader_orc_and_json_formats(spark, sf_dir, tmp_path):
    """OP-23 format breadth: the same mode machinery (incl. MERGE's
    reconcile-and-swap) works on ORC and JSON sinks, not just parquet
    (reference HIVE_FILE_FORMATS, const.py:19-26)."""
    from pyspark.sql import functions as F

    from lightlane_spark.loaders.loader import Loader
    from lightlane_spark.sources.parquet import read_table

    orders = read_table(spark, sf_dir, "orders")
    staging = orders.filter("o_orderkey % 3 = 0").withColumn(
        "o_orderpriority", F.lit("MERGED")
    )
    for fmt in ("orc", "json"):
        path = str(tmp_path / f"orders_{fmt}")
        Loader(spark, path, "overwrite", fmt=fmt).execute(orders)
        Loader(
            spark, path, "merge", primary_keys=["o_orderkey"], fmt=fmt
        ).execute(staging)
        back = spark.read.format(fmt).load(path)
        assert back.count() == orders.count()
        assert back.filter("o_orderpriority = 'MERGED'").count() == staging.count()


def test_orc_helpers_roundtrip(spark, sf_dir, tmp_path):
    """write_orc/read_orc round-trip (the library's ORC format slot —
    q_orc_roundtrip exercises the raw writer; these helpers are the
    public API form and must stay equivalent)."""
    from lightlane_spark.loaders.text_sinks import read_orc, write_orc
    from lightlane_spark.sources.parquet import read_table

    df = read_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    assert sorted(r["r_regionkey"] for r in back.collect()) == sorted(
        r["r_regionkey"] for r in df.collect()
    )
