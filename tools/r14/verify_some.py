#!/usr/bin/env python
"""Round-13 optimization helper: oracle-verify a SUBSET of queries
fast (the full verify_vanilla sweep takes ~25 min; a per-change gate
needs seconds). Same comparator and view setup as the freeze gate.

Run: python tools/r14/verify_some.py <query> [query ...]
Env: SPARK_GRAFT_SWEEP_SF_DIR (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]").appName("verify-some").getOrCreate()
)
spark.sparkContext.setLogLevel("FATAL")
import duckdb  # noqa: E402

import __spark_entry__ as m  # noqa: E402
from tools.oracle_compare import compare, register_views  # noqa: E402

sf = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
register_views(con, sf)

qs, osql = m.queries(), m.oracle_sql()
bad = []
for name in sys.argv[1:]:
    if name not in qs:
        print(f"SKIP {name}: not in queries()", flush=True)
        continue
    try:
        sdf = qs[name](spark, sf)
        if name not in osql:
            sdf.collect()
            print(f"{name}: no oracle, ran OK", flush=True)
            continue
        schema_ok, values_ok, ns, no = compare(con, sdf, osql[name])
        if schema_ok and values_ok:
            print(f"{name}: OK {ns}/{no}", flush=True)
        else:
            bad.append(name)
            print(
                f"MISMATCH {name} cols_ok={schema_ok} {ns} {no}", flush=True
            )
    except Exception as e:  # noqa: BLE001
        bad.append(name)
        print(f"FAIL {name} {type(e).__name__} {str(e)[:200]}", flush=True)
    finally:
        from lightlane_spark.cache import unpersist_all

        unpersist_all()
        spark.catalog.clearCache()
print("DONE bad =", bad, flush=True)
sys.exit(1 if bad else 0)
