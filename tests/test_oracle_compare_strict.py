"""The strict oracle comparator's contract (VERDICT r8 ask #2).

r7/r8 shipped a driver-red query the local gate called green because
the old canonicalization collapsed exactly the distinctions the
driver checks (tz-aware→naive, Decimal→float). These tests pin the
strict behavior value-class by value-class so a future
"simplification" of tools/oracle_compare.py can't reopen the hole
without a red test. Pure Python — no Spark session; the end-to-end
path is exercised by tests/test_oracle_parity.py and the gate tools.
"""

from __future__ import annotations

import datetime as dt
import decimal

import duckdb

from tools.oracle_compare import canon, compare, strict_val


class FakeFrame:
    """Duck-typed stand-in for the two DataFrame members compare()
    touches (.columns / .collect())."""

    def __init__(self, columns, rows):
        self.columns = columns
        self._rows = rows

    def collect(self):
        return self._rows


def test_aware_vs_naive_datetime_differ():
    naive = dt.datetime(2024, 1, 1, 12)
    aware = dt.datetime(2024, 1, 1, 12, tzinfo=dt.timezone.utc)
    assert strict_val(naive) != strict_val(aware)
    # and the difference is SCHEMA-class (distinct tags), mirroring
    # the driver's TIMESTAMPTZ-vs-TIMESTAMP schema_match=false
    assert strict_val(naive)[0] == "datetime"
    assert strict_val(aware)[0] == "datetimetz"


def test_decimal_never_equals_float():
    assert strict_val(decimal.Decimal("1.5")) != strict_val(1.5)


def test_decimal_keeps_scale():
    assert strict_val(decimal.Decimal("1.50")) != strict_val(
        decimal.Decimal("1.5")
    )


def test_int_never_equals_float_and_bool_never_equals_int():
    assert strict_val(5) != strict_val(5.0)
    assert strict_val(True) != strict_val(1)


def test_float_compares_by_full_repr():
    # one-ulp apart — a libm divergence must be a mismatch
    a, b = 0.1 + 0.2, 0.3
    assert a != b
    assert strict_val(a) != strict_val(b)
    assert strict_val(0.3) == strict_val(0.3)


def test_nan_equals_nan():
    assert strict_val(float("nan")) == strict_val(float("nan"))


def test_bytes_and_bytearray_unify():
    assert strict_val(b"ab") == strict_val(bytearray(b"ab"))


def test_arrays_recurse():
    assert strict_val([1, 2.0]) == strict_val((1, 2.0))
    assert strict_val([1]) != strict_val([1.0])


def test_maps_sort_keys():
    assert strict_val({"b": 1, "a": 2}) == strict_val({"a": 2, "b": 1})


def test_map_keys_are_type_tagged():
    """An int key 1 and a str key '1' must not collide (r10 ADVICE
    #3: str(k) erased key-type distinctions, inconsistent with the
    everything-type-tagged philosophy)."""
    assert strict_val({1: "x"}) != strict_val({"1": "x"})


def test_map_mixed_value_types_sort_without_typeerror():
    """Two stringify-equal keys whose values are None vs a tag-tuple
    raised TypeError under the old (str(k), canon) pair sort; the
    repr-keyed sort is a total order over mixed shapes."""
    m = {1: None, "1": 2}
    got = strict_val(m)  # must not raise
    assert got[0] == "map" and len(got[1]) == 2
    # and stays order-insensitive
    assert strict_val({"a": None, "b": 1}) == strict_val({"b": 1, "a": None})


def test_spark_struct_row_matches_duckdb_dict():
    """Spark collects struct columns as Row (a tuple subclass with
    asDict); DuckDB returns dicts — they must canonicalize alike, not
    as list-vs-map."""

    class FakeRow(tuple):
        def asDict(self):
            return {"a": self[0], "b": self[1]}

    assert strict_val(FakeRow((1, "x"))) == strict_val({"a": 1, "b": "x"})
    assert strict_val(FakeRow((1, "x"))) != strict_val({"a": 1, "b": "y"})


def test_canon_sorts_columns_and_rows_and_reports_tags():
    rows = [(1, "x"), (None, "y")]
    vals, cols, tags = canon(["n", "s"], rows)
    assert cols == ["n", "s"]
    assert tags == [{"int"}, {"str"}]  # None contributes no tag
    # row multiset is order-insensitive
    vals2, _, _ = canon(["n", "s"], rows[::-1])
    assert vals == vals2


def test_canon_sorts_mixed_null_rows_without_typeerror():
    # None vs tuple at the same position must not raise during sort
    rows = [(None,), (1,), (None,)]
    vals, _, _ = canon(["x"], rows)
    assert len(vals) == 3


def test_compare_catches_timestamptz_vs_naive():
    """End-to-end repro of the r7/r8 hole: DuckDB to_timestamp()
    yields TIMESTAMPTZ; a Spark-naive frame must NOT compare equal,
    and the cast-to-TIMESTAMP oracle form must."""
    con = duckdb.connect()
    naive_rows = [(dt.datetime(1970, 1, 1, 0, 0),)]
    sdf = FakeFrame(["ts"], naive_rows)
    schema_ok, values_ok, *_ = compare(con, sdf, "SELECT to_timestamp(0) AS ts")
    assert not schema_ok and not values_ok
    schema_ok, values_ok, *_ = compare(
        con, sdf, "SELECT CAST(to_timestamp(0) AS TIMESTAMP) AS ts"
    )
    assert schema_ok and values_ok


def test_compare_catches_decimal_vs_double_column():
    con = duckdb.connect()
    sdf = FakeFrame(["v"], [(1.5,)])
    schema_ok, values_ok, *_ = compare(
        con, sdf, "SELECT CAST(1.5 AS DECIMAL(10,1)) AS v"
    )
    assert not schema_ok and not values_ok
    schema_ok, values_ok, *_ = compare(con, sdf, "SELECT CAST(1.5 AS DOUBLE) AS v")
    assert schema_ok and values_ok
