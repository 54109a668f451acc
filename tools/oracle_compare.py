"""Shared oracle-comparison helpers for the driver-mimic checkers.

One definition of value canonicalization and DuckDB view setup, used
by BOTH tools/verify_vanilla.py (full 251-query sweep) and
tools/check_window.py (first-50 freeze gate) — a canonicalization fix
landing in one but not the other would make the gate and the sweep
disagree on the same query output.

The canon form mirrors what the round driver records: columns sorted
by name, rows sorted as tuples, Decimals→float, datetimes→naive ISO,
NaN→'NaN'.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os


def norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows), sorted(cols)


def register_views(con, sf_dir: str) -> None:
    """CREATE VIEW per test table that exists under ``sf_dir``."""
    from lightlane_spark.sources.parquet import TABLES, table_path

    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def compare(con, sdf, oracle_sql: str) -> tuple[bool, bool, int, int]:
    """Run the oracle and compare against a collected Spark frame.
    Returns (schema_ok, values_ok, n_spark, n_oracle)."""
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle_sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    sv, sc = canon(sdf.columns, srows)
    ov, oc = canon(ocols, orows)
    return sc == oc, sv == ov, len(sv), len(ov)
