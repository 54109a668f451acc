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


def test_compare_catches_uncast_hugeint_sum():
    """THE five-round hole (VERDICT r11 "What's wrong" #1-2): DuckDB
    promotes SUM over integer columns to HUGEINT. fetchall() collapsed
    that to Python int (local green) while Arrow export renders it as
    decimal128(38,0) -> Decimal (driver red: int64 vs Decimal). The
    comparator now fetches via Arrow, so an UNCAST integer SUM must
    FAIL against a Spark int64 frame — and the CAST(... AS BIGINT)
    form must pass. If this test starts passing with fetchall-based
    fetching, the hole has been reopened."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    con.execute("INSERT INTO t VALUES (2), (3)")
    sdf = FakeFrame(["s"], [(5,)])  # Spark SUM(BIGINT) collects as int
    schema_ok, values_ok, *_ = compare(con, sdf, "SELECT SUM(x) AS s FROM t")
    assert not schema_ok and not values_ok
    schema_ok, values_ok, *_ = compare(
        con, sdf, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM t"
    )
    assert schema_ok and values_ok


def test_fetch_oracle_typed_sees_arrow_types():
    """The typed fetch is the driver-faithful path: HUGEINT must
    surface as Decimal (not int), and a top-level MAP must come back
    as a dict (Arrow's list-of-pairs wire shape papered over) so a
    future map-emitting oracle compares by value."""
    from tools.oracle_compare import fetch_oracle_typed

    con = duckdb.connect()
    cols, rows = fetch_oracle_typed(
        con, "SELECT 5::HUGEINT AS h, MAP([1, 2], ['a', 'b']) AS m"
    )
    assert cols == ["h", "m"]
    ((h, m),) = rows
    assert isinstance(h, decimal.Decimal) and h == 5
    assert m == {1: "a", 2: "b"}


def test_fetch_oracle_typed_converts_nested_maps():
    """ADVICE r12 #2: maps nested inside STRUCT/LIST must also come
    back as dicts (maps_as_pydicts='strict' applies at every level),
    not Arrow's list-of-pairs wire shape."""
    from tools.oracle_compare import fetch_oracle_typed

    con = duckdb.connect()
    cols, rows = fetch_oracle_typed(
        con,
        "SELECT {'inner': MAP([1], ['a'])} AS s, "
        "[MAP([2], ['b'])] AS l",
    )
    assert cols == ["s", "l"]
    ((s, l),) = rows
    assert s == {"inner": {1: "a"}}
    assert l == [{2: "b"}]


def test_compare_map_column_matches_spark_dict():
    con = duckdb.connect()
    sdf = FakeFrame(["m"], [({1: "a"},)])
    schema_ok, values_ok, *_ = compare(
        con, sdf, "SELECT MAP([1], ['a']) AS m"
    )
    assert schema_ok and values_ok
    schema_ok, values_ok, *_ = compare(
        con, sdf, "SELECT MAP([1], ['b']) AS m"
    )
    assert not values_ok


def test_compare_catches_decimal_vs_double_column():
    con = duckdb.connect()
    sdf = FakeFrame(["v"], [(1.5,)])
    schema_ok, values_ok, *_ = compare(
        con, sdf, "SELECT CAST(1.5 AS DECIMAL(10,1)) AS v"
    )
    assert not schema_ok and not values_ok
    schema_ok, values_ok, *_ = compare(con, sdf, "SELECT CAST(1.5 AS DOUBLE) AS v")
    assert schema_ok and values_ok


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis): the comparator's core claims
# hold for arbitrary value shapes, not just the hand-picked cases.
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=8),
    st.decimals(
        allow_nan=False, allow_infinity=False, places=3,
        min_value=-(10**6), max_value=10**6,
    ),
    st.dates(min_value=dt.date(1970, 1, 1), max_value=dt.date(2100, 1, 1)),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(
            st.one_of(st.integers(min_value=0, max_value=9), st.text(max_size=3)),
            children,
            max_size=3,
        ),
    ),
    max_leaves=6,
)


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(st.tuples(_value, _value, _value), min_size=0, max_size=6),
    seed=st.randoms(use_true_random=False),
)
def test_canon_invariant_under_row_and_column_permutation(rows, seed):
    """The driver sorts columns by name and rows canonically before
    hashing; canon() must therefore be a pure function of the
    (column-name -> multiset of values) mapping — any row order and
    any column order must canonicalize identically, for ARBITRARY
    nested value shapes (incl. mixed-type map keys and None)."""
    cols = ["b", "a", "c"]
    base = canon(cols, rows)

    shuffled_rows = list(rows)
    seed.shuffle(shuffled_rows)
    assert canon(cols, shuffled_rows) == base

    perm = [2, 0, 1]  # c, b, a
    pcols = [cols[i] for i in perm]
    prows = [tuple(r[i] for i in perm) for r in shuffled_rows]
    assert canon(pcols, prows) == base


@settings(max_examples=200, deadline=None)
@given(v=_value)
def test_strict_val_total_and_deterministic(v):
    """strict_val never raises on any supported shape and is
    deterministic (same input -> same canonical form)."""
    assert strict_val(v) == strict_val(v)


def test_stringify_equal_values_stay_distinct_across_classes():
    """1, '1', 1.0, Decimal('1') all render as '1'-ish strings; the
    comparator must keep every pair distinct (the type-tag
    philosophy the map-key fix extended to keys)."""
    forms = [
        strict_val(1),
        strict_val("1"),
        strict_val(1.0),
        strict_val(decimal.Decimal("1")),
        strict_val(True),
    ]
    assert len({repr(f) for f in forms}) == len(forms)
