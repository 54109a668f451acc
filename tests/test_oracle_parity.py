"""Driver-mimic: every queries() entry must match its DuckDB oracle
(row count + column names + order-insensitive values) at sf0.001.

This is a local, stricter rehearsal of the driver's CORRECTNESS gate
(which runs at sf0.01): values are compared exactly, not hashed.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from lightlane_spark.sources.parquet import TABLES, table_path


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    ), sorted(cols)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check, like the driver's
        return
    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    s_vals, s_cols = _canon(scols, srows)
    o_vals, o_cols = _canon(ocols, orows)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_vals) == len(o_vals), f"{name}: rowcount {len(s_vals)} vs {len(o_vals)}"
    mismatch = [i for i, (a, b) in enumerate(zip(s_vals, o_vals)) if a != b][:3]
    assert not mismatch, (
        f"{name}: first mismatches at {mismatch}: "
        + "; ".join(f"spark={s_vals[i]} oracle={o_vals[i]}" for i in mismatch)
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None
