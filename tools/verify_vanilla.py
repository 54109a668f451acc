"""Driver-mimic correctness sweep: run EVERY queries() entry on a
PLAIN SparkSession (no lightlane session tuning) and compare against
its oracle_sql() via DuckDB — exactly what the round driver does.

Run from anywhere: python tools/verify_vanilla.py
Env: SPARK_GRAFT_SWEEP_SF_DIR (default /root/testdata/sf0.01).
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = SparkSession.builder.master('local[8]').appName('vanilla').getOrCreate()
spark.sparkContext.setLogLevel('FATAL')
import __spark_entry__ as m
import datetime as dt, decimal, math, duckdb
from lightlane_spark.sources.parquet import TABLES, table_path

sf = os.environ.get('SPARK_GRAFT_SWEEP_SF_DIR', '/root/testdata/sf0.01')
con = duckdb.connect()
for t in TABLES:
    p = table_path(sf, t)
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return 'NaN'
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows), sorted(cols)

qs, osql = m.queries(), m.oracle_sql()
bad = []
for name in sorted(qs):
    try:
        sdf = qs[name](spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in osql:
            continue
        res = con.execute(osql[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        sv, sc = canon(sdf.columns, srows)
        ov, oc = canon(ocols, orows)
        if sc != oc or sv != ov:
            bad.append(name)
            print('MISMATCH', name, 'cols_ok=', sc == oc, len(sv), len(ov), flush=True)
    except Exception as e:
        bad.append(name)
        print('FAIL', name, type(e).__name__, str(e)[:150], flush=True)
print('DONE bad =', bad, flush=True)

# Machine-readable sweep record: one row per query with the same
# three checks the driver records (rows / schema / values), so
# queries rotated out of the driver's 50-slot correctness window
# still have a committed, checkable artifact. Opt-in via
# SPARK_GRAFT_SWEEP_RECORD=<path> (the repo commits SWEEP_LOCAL.json
# produced at sf0.01).
record_path = os.environ.get('SPARK_GRAFT_SWEEP_RECORD')
if record_path:
    import json as _json
    import subprocess as _sp

    rev = _sp.run(
        ['git', '-C', os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         'rev-parse', '--short', 'HEAD'],
        capture_output=True, text=True,
    ).stdout.strip()
    rec = {
        'sf_dir': sf,
        'git_rev': rev,
        'n_queries': len(qs),
        'results': {
            name: ('fail' if name in bad else
                   'pass' if name in osql else 'no_oracle')
            for name in sorted(qs)
        },
    }
    with open(record_path, 'w') as fh:
        _json.dump(rec, fh, indent=1, sort_keys=True)
    print('wrote', record_path, flush=True)
