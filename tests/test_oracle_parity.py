"""Driver-mimic: every queries() entry must match its DuckDB oracle
(row count + column names + order-insensitive values) at sf0.001.

This is a local, stricter rehearsal of the driver's CORRECTNESS gate
(which runs at sf0.01), sharing the ONE strict comparator in
tools/oracle_compare.py with the freeze gate and the full sweep —
type-tagged values (int never equals float, Decimal keeps scale,
floats compare by full repr) and tz-aware vs naive datetimes as a
schema-class difference. r7/r8 shipped a driver red the old lenient
local compare called green; a single shared strict definition is the
fix (VERDICT r8 ask #2).
"""

from __future__ import annotations

import re

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.oracle_compare import canon, fetch_oracle_typed, register_views

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# The dtype allowlist and checker live in tools/oracle_compare.py —
# ONE definition shared with the sweep (tools/verify_vanilla.py) and
# the freeze gate (tools/check_window.py), so the pytest gate and the
# driver-mimic tools can never disagree on what types are admissible.
from tools.oracle_compare import (  # noqa: E402
    ALLOWED_ORACLE_TYPE_TOKENS,
    assert_oracle_dtypes,
    dtype_allowed,
)


def test_no_oracle_emits_driver_divergent_types(sf_dir):
    """Registry-wide oracle dtype gate (VERDICT r11 ask #3) — the
    mirror of the Spark-side no-DecimalType gate. DESCRIBE every
    oracle (plans only, no execution) and fail on any output column
    whose physical type is not on the audited allowlist of types
    whose Arrow export matches Spark collect class-for-class (e.g.
    HUGEINT, whose Arrow Decimal vs Spark int64 split caused five
    rounds of driver reds)."""
    con = duckdb.connect()
    register_views(con, sf_dir)
    assert_oracle_dtypes(con, ORACLES)


def test_dtype_allowlist_flags_known_divergent_types():
    """The gate's token check must flag every historically-divergent
    class: HUGEINT (the r7-r11 reds), TIMESTAMP WITH TIME ZONE (the
    r7/r8 red), DECIMAL, and exotic types Spark can't collect — and
    accept every type actually in the registry today."""
    bad = [
        "HUGEINT",
        "UHUGEINT",
        "TIMESTAMP WITH TIME ZONE",
        "DECIMAL(18,2)",
        "INTERVAL",
        "TIME",
        "UUID",
        "BIGINT[]",   # LIST: unaudited until a query needs it
        "STRUCT(a BIGINT)",
    ]
    for ctype in bad:
        assert not dtype_allowed(ctype), ctype
    for ctype in sorted(ALLOWED_ORACLE_TYPE_TOKENS):
        assert dtype_allowed(ctype)
    # ADVICE r12 #3: empty/whitespace type strings must FAIL, not
    # pass vacuously (empty token set is a subset of any allowlist)
    assert not dtype_allowed("")
    assert not dtype_allowed("   ")
    assert not dtype_allowed("()")
    # and the raising form carries the offender in its message
    con = duckdb.connect()
    try:
        assert_oracle_dtypes(con, {"h": "SELECT 1::HUGEINT AS v"})
    except AssertionError as exc:
        assert "HUGEINT" in str(exc)
    else:  # pragma: no cover
        raise AssertionError("uncaught HUGEINT oracle")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check, like the driver's
        return
    con = duckdb.connect()
    register_views(con, sf_dir)
    # typed Arrow fetch — fetchall() erased DuckDB's physical type
    # (HUGEINT -> int), the exact comparator hole behind the r7-r11
    # driver reds; this path sees what the driver's hasher sees
    ocols, orows = fetch_oracle_typed(con, ORACLES[name])
    s_vals, s_cols, s_tags = canon(scols, srows)
    o_vals, o_cols, o_tags = canon(ocols, orows)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    tag_bad = [
        (c, a, b)
        for c, a, b in zip(s_cols, s_tags, o_tags)
        if a and b and a != b
    ]
    assert not tag_bad, f"{name}: value-type mismatch {tag_bad}"
    assert len(s_vals) == len(o_vals), (
        f"{name}: rowcount {len(s_vals)} vs {len(o_vals)}"
    )
    mismatch = [i for i, (a, b) in enumerate(zip(s_vals, o_vals)) if a != b][:3]
    assert not mismatch, (
        f"{name}: first mismatches at {mismatch}: "
        + "; ".join(f"spark={s_vals[i]} oracle={o_vals[i]}" for i in mismatch)
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None
