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

# ALLOWLIST of DuckDB output types whose Arrow-export Python class is
# verified identical to the class Spark's collect() produces for the
# matching Spark type. Everything else fails the gate until audited
# in — HUGEINT (DuckDB's silent SUM(int) promotion, Arrow
# decimal128(38,0) → Decimal vs Spark int64) cost five rounds of
# driver reds on l_diversity / two_hop_features / kaplan_meier
# (VERDICT r11), and an allowlist also pre-blocks the other known
# divergent classes (TIMESTAMP WITH TIME ZONE vs naive — the r7/r8
# red; DECIMAL outputs, barred Spark-side by the no-DecimalType
# gate; INTERVAL / TIME / UUID / ENUM, which Spark can't collect as
# the same class at all). To admit a new type: verify its
# fetch_arrow_table().to_pylist() class matches Spark collect for
# the intended Spark type, then add the token here with a note.
_ALLOWED_ORACLE_TYPE_TOKENS = {
    "BIGINT",     # Arrow int64 → int; Spark LongType → int
    "INTEGER",    # Arrow int32 → int; Spark IntegerType → int
    "SMALLINT",   # Arrow int16 → int
    "TINYINT",    # Arrow int8 → int
    "DOUBLE",     # Arrow float64 → float; Spark DoubleType → float
    "VARCHAR",    # Arrow string → str
    "BOOLEAN",    # Arrow bool → bool
    "DATE",       # Arrow date32 → datetime.date
    "TIMESTAMP",  # Arrow timestamp[us] (naive) → naive datetime;
                  # the WITH TIME ZONE form fails via its extra tokens
}


def _dtype_allowed(ctype: str) -> bool:
    """True iff every alphabetic token of the DESCRIBE type is on the
    allowlist AND the type carries no list marker — ``BIGINT[]``
    tokenizes to just {BIGINT}, so the bracket must be checked
    separately or LIST types would slip through as their element."""
    if "[" in ctype:
        return False
    toks = set(re.findall(r"[A-Z_]+", ctype.upper()))
    return toks <= _ALLOWED_ORACLE_TYPE_TOKENS


def test_no_oracle_emits_driver_divergent_types(sf_dir):
    """Registry-wide oracle dtype gate (VERDICT r11 ask #3) — the
    mirror of the Spark-side no-DecimalType gate. DESCRIBE every
    oracle (plans only, no execution) and fail on any output column
    whose physical type is not on the audited allowlist of types
    whose Arrow export matches Spark collect class-for-class."""
    con = duckdb.connect()
    register_views(con, sf_dir)
    hits = []
    for name in sorted(ORACLES):
        desc = con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
        for cname, ctype, *_ in desc:
            if not _dtype_allowed(ctype):
                hits.append((name, cname, ctype))
    assert not hits, (
        "oracle output types off the audited allowlist (their Arrow "
        "Python class may differ from Spark collect — the HUGEINT "
        f"class that caused five rounds of driver reds): {hits}"
    )


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
        assert not _dtype_allowed(ctype), ctype
    for ctype in sorted(_ALLOWED_ORACLE_TYPE_TOKENS):
        assert _dtype_allowed(ctype)


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
