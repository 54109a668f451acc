#!/usr/bin/env python
"""Driver-window rehearsal: run the FIRST N (default 50) queries()
entries — exactly the slice the round driver's correctness check
will record — on a plain SparkSession against their DuckDB oracles.

This is the freeze gate (VERDICT r7 ask #1): after the window is
generated (tools/rotate_window.py) and before round close, this must
print ``WINDOW DONE bad = []``; any query that changes after that
must go back to the front of the window via --changed on the next
rotate_window run.

Run: python tools/check_window.py [N]
Env: SPARK_GRAFT_SWEEP_SF_DIR (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")

    import duckdb

    spark = SparkSession.builder.master("local[8]").appName("window").getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")
    import __spark_entry__ as m
    from lightlane_spark.sources.parquet import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, osql = m.queries(), m.oracle_sql()
    bad = []
    for name in list(qs)[:n]:
        try:
            sdf = qs[name](spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                print(f"{name}: NO_ORACLE rows={len(srows)}", flush=True)
                continue
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            sv, sc = canon(sdf.columns, srows)
            ov, oc = canon(ocols, orows)
            ok = sc == oc and sv == ov
            if not ok:
                bad.append(name)
            print(
                f"{name}: {'OK' if ok else 'MISMATCH'} {len(sv)}/{len(ov)}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — report, keep checking
            bad.append(name)
            print(f"{name}: FAIL {type(exc).__name__} {str(exc)[:150]}", flush=True)
    print("WINDOW DONE bad =", bad, flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
