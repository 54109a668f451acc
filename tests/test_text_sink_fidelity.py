"""FIXTURES.md B3 — escaping and null-token fidelity of the text sinks
(OP-15/16/18/19 semantics the reference encodes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightlane_spark.loaders.text_sinks import (
    HIVE_NULL,
    read_csv,
    read_hive_text,
    serialize_complex_columns,
    write_csv,
    write_hive_text,
)

TRICKY = [
    (1, "embedded,comma"),
    (2, 'quo"te'),
    (3, "line\nbreak"),
    (4, "carriage\rreturn"),
    (5, "ctrl\x01chars\x02and\x03more"),
    (6, "back\\slash"),
    (7, r"\N"),  # literal backslash-N, NOT a null
    (8, ""),  # empty string
    (9, None),  # true null
    (10, "tab\there"),
]


def test_csv_roundtrip_tricky_strings(spark, tmp_path):
    """Quoted CSV must round-trip every control character exactly and
    keep null vs empty-string distinguishable."""
    df = spark.createDataFrame(TRICKY, "id: bigint, s: string")
    path = str(tmp_path / "csv")
    # distinguishable null: use a token no data contains
    write_csv(df, path, null_token="NULLTOKEN")
    back = read_csv(
        spark, path, "id bigint, s string", null_token="NULLTOKEN"
    )
    got = {r.id: r.s for r in back.collect()}
    exp = dict(TRICKY)
    assert got == exp  # includes None for id 9 and "" for id 8


def test_hive_text_nulls_and_delimiters(spark, tmp_path):
    """Hive text cannot represent its own delimiters inside values —
    the writer strips them (documented OP-16 behavior); \\N token and
    true nulls must round-trip as nulls."""
    df = spark.createDataFrame(TRICKY, "id: bigint, s: string")
    path = str(tmp_path / "ht")
    write_hive_text(df, path)
    back = read_hive_text(spark, path, "id bigint, s string")
    got = {r.id: r.s for r in back.collect()}
    assert got[1] == "embedded,comma"
    assert got[5] == "ctrl chars and more"  # delimiter bytes stripped
    assert got[9] is None  # true null → \N → null
    assert got[7] is None or got[7] == r"\N"  # literal \N: documented limit
    assert got[3] == "line break" and got[4] == "carriage return"


def test_nested_values_serialize_to_json_cells(spark, tmp_path):
    """FIXTURES.md B2: nested array/map/struct → JSON string in the
    cell (reference csv_handler.py:74-75)."""
    df = spark.createDataFrame(
        [(1, ["a", "b"], {"k": "v"}, ("n", 3))],
        "id: bigint, tags: array<string>, attrs: map<string,string>, profile: struct<name:string,age:int>",
    )
    out = serialize_complex_columns(df).first()
    assert out.tags == '["a","b"]'
    assert out.attrs == '{"k":"v"}'
    assert out.profile == '{"name":"n","age":3}'
    path = str(tmp_path / "nested_csv")
    write_csv(df, path)
    back = read_csv(spark, path, "id bigint, tags string, attrs string, profile string")
    r = back.first()
    assert r.tags == '["a","b"]' and r.profile == '{"name":"n","age":3}'
