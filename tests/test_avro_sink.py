"""Pure-Python Avro container sink/source: round-trip fidelity across
types and nulls, container-format invariants, empty-partition shape."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F

from lightlane_spark.loaders.avro_sink import (
    _MAGIC,
    avro_schema_json,
    read_avro,
    write_avro,
)
from lightlane_spark.sources.parquet import read_table

_DDL = "l_orderkey bigint, l_linenumber int, l_quantity double, l_returnflag string"


def test_avro_roundtrip_lineitem(spark, sf_dir):
    out = str(spark._sc._temp_dir) + "/avro_li"
    df = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
    )
    n = write_avro(df, out)
    assert n == df.count()
    back = read_avro(spark, out, _DDL)
    assert back.schema.simpleString() == df.schema.simpleString()
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_avro_all_types_and_nulls(spark, tmp_path):
    rows = [
        (1, True, 2, 3.5, "x", b"\x00\x01", dt.date(2024, 2, 29),
         dt.datetime(2024, 1, 2, 3, 4, 5, 123456)),
        (2, None, None, None, None, None, None, None),
        (3, False, -7, -0.25, "héllo\nworld", b"", dt.date(1969, 12, 31),
         dt.datetime(1969, 12, 31, 23, 59, 59, 999999)),
    ]
    ddl = (
        "id bigint, b boolean, i int, d double, s string, bin binary, "
        "dt date, ts timestamp_ntz"
    )
    df = spark.createDataFrame(rows, ddl)
    out = str(tmp_path / "avro_types")
    assert write_avro(df, out) == 3
    back = read_avro(spark, out, ddl)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_container_invariants(spark, tmp_path):
    """File-level checks against the public spec: magic bytes, schema
    embedded in the metadata map, sync marker repeated after each
    block — so standard Avro tooling can open our files."""
    df = spark.range(10).select(F.col("id").cast("bigint").alias("id"))
    out = str(tmp_path / "avro_inv")
    write_avro(df.repartition(1), out)
    import os

    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 1
    data = open(os.path.join(out, files[0]), "rb").read()
    assert data.startswith(_MAGIC)
    assert b"avro.schema" in data and b"avro.codec" in data
    schema = json.loads(avro_schema_json(df.schema))
    assert schema["fields"][0]["name"] == "id"
    # sync marker = bytes [header_end-16 : header_end] appears at EOF too
    assert data[-16:] in data[: len(data) - 16]


def test_avro_empty_partitions_write_no_files(spark, tmp_path):
    df = spark.range(4).repartition(8)  # > partitions than rows
    out = str(tmp_path / "avro_empty")
    assert write_avro(df.select(F.col("id")), out) == 4
    import os

    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert 0 < len(files) <= 4
    back = read_avro(spark, out, "id bigint")
    assert sorted(r.id for r in back.collect()) == [0, 1, 2, 3]


def test_avro_rejects_unsupported_type(spark):
    df = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(TypeError, match="unsupported"):
        avro_schema_json(df.schema)


def test_avro_write_modes(spark, tmp_path):
    """A second write must not silently clobber part files: default
    mode refuses, overwrite replaces."""
    out = str(tmp_path / "avro_modes")
    df5 = spark.range(5).select(F.col("id"))
    df3 = spark.range(3).select(F.col("id"))
    assert write_avro(df5, out) == 5
    with pytest.raises(FileExistsError, match="part"):
        write_avro(df3, out)
    assert write_avro(df3, out, mode="overwrite") == 3
    assert sorted(r.id for r in read_avro(spark, out, "id bigint").collect()) == [0, 1, 2]
