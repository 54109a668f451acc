#!/usr/bin/env python
"""Scale-ratio audit (VERDICT r12 ask #1): measure the scaling
EXPONENT of the heavy operators instead of arguing it from plans.

Derives a factor-N corpus from sf0.1 into a temp dir (id-shifted
unions — the ``_docs_with_dups`` derivation pattern from
``queries_m5.py``; /root/testdata is never touched), runs the
heavy-query audit set at 1x and Nx, and writes ``SCALE_RATIO.json``
with the per-query steady-state runtime ratio. Near-linear operators
land well under the bar (default 15 for N=10 — linear plus AQE /
scheduling slop); a hidden quadratic candidate blowup shows up here
and nowhere else.

Derivation rules (copy i of N, copy 0 verbatim):

- every key column shifts by ``i * stride`` where stride is the next
  power of 10 above the key's max — copies occupy disjoint key
  ranges and foreign keys stay valid WITHIN a copy (o_custkey shifts
  by the customer stride, l_orderkey by the orders stride, ...);
- ``documents.text`` gets a per-copy suffix on EVERY word for i>0,
  so copy vocabularies are disjoint: shingle/minhash/similarity
  structure is preserved per copy but never bridges copies — the
  duplicate-pair population grows LINEARLY with N, the way a real
  10x corpus of new documents behaves. Verbatim copies would
  manufacture a quadratic pair blowup in the DATA (every doc x 10
  exact clones) and the audit would measure the fixture, not the
  operator. Power-of-10 strides are ≡ 0 (mod 5), so the
  ``doc_id % 5`` exact-dup fixture in ``_docs_with_dups`` selects
  the same in-copy rows in every copy;
- ``embeddings.embedding`` rotates by i positions for i>0 — same
  norm and coordinate distribution, but rotations of random vectors
  are uncorrelated, so ANN/semantic-dedup neighborhoods stay
  copy-local and probe sets (``vec_id < 10``: copy 0 only) keep a
  fixed size;
- ``region``/``nation`` stay single-copy (broadcast dims);
- BOTH scales are written by the same DuckDB writer (factor 1 and
  factor N), so row-group layout and encodings are identical and
  the ratio isolates data volume.

Run:  python tools/scale_ratio.py [--factor 10] [--reps 2]
      [--src /root/testdata/sf0.1] [--workdir /tmp/...]
      [--queries a,b,c] [--keep]
Output: SCALE_RATIO.json at the repo root (override with --out).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# Memory must scale with data or the exponent measurement is
# contaminated: at 10x, the 8g default heap evicts the persisted
# intermediates mid-rep (measured: set_similarity_join reps got
# SLOWER after rep 1 — 19/29/26 s — while its candidate cardinalities
# scaled exactly 10x; SCALE.md r13), so the ratio reports cache
# thrash, not the operator's dataflow. A real cluster holds
# memory-per-byte-of-data roughly constant; 32g for a 10x corpus
# mirrors that. Env override wins if the caller set one. Must happen
# BEFORE any lightlane_spark.session import — the conf dict reads the
# env at module import time.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

# The audit set: every bench query over ~1.4 s steady at sf0.1
# (BENCH_IDLE r12) plus the judge-named bpe_train / bucketed_join —
# the chains where a super-linear candidate or shuffle blowup would
# hide. Fast queries are excluded: their per-run constant (~0.2 s of
# scheduling + action overhead) would dominate the ratio, not the
# operator.
AUDIT_QUERIES = [
    "leakage_safe_split",
    "compacted_load",
    "neardup_dedup_quality",
    "neardup_clusters",
    "join_size_estimate",
    "kcore_peel",
    "minhash_join",
    "dpp_scan",
    "bow_similarity",
    "minhash_lsh_pairs",
    "hybrid_retrieval",
    "ann_topk_lsh",
    "set_similarity_join",
    "frequent_pairs",
    "pq_topk",
    "ann_topk_ivf",
    "cooccurrence_pmi",
    "semantic_dedup",
    "bpe_train",
    "bucketed_join",
    # r14 breadth (VERDICT r13 ask #7): the new top-10 entrants of the
    # r13 driver bench, plus ngram_jaccard whose verify path was
    # reshaped this round — the 10x evidence tracks the CURRENT cost
    # ranking, not r12's.
    "compression_ratio",
    "product_type_profit",
    "retrieval_metrics",
    "ngram_jaccard",
]

# Ratio bar for factor 10: linear (10) plus AQE/startup/scheduling
# slop. Scaled proportionally for other factors.
BAR_AT_10X = 15.0

# key column -> table whose max value sets the shift stride
_KEY_OWNER = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "doc_id": "documents",
    "vec_id": "embeddings",
    "event_id": "events",
    "user_id": "events",
}

# per-table key columns and which stride family each uses
_TABLE_KEYS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

_VERBATIM_TABLES = ("region", "nation")


def _pow10_above(n: int) -> int:
    p = 10
    while p <= n:
        p *= 10
    return p


def derive(src_dir: str, out_dir: str, factor: int) -> dict[str, int]:
    """Write a factor-N derived corpus (one parquet file per table)
    under ``out_dir``. Returns {table: row_count}."""
    import duckdb

    from lightlane_spark.sources.parquet import TABLES, table_path

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # strides from the source maxima
    strides: dict[str, int] = {}
    for key, owner in _KEY_OWNER.items():
        p = table_path(src_dir, owner)
        mx = con.execute(f"SELECT max({key}) FROM '{p}'").fetchone()[0]
        strides[key] = _pow10_above(int(mx))

    counts: dict[str, int] = {}
    for t in TABLES:
        src = table_path(src_dir, t)
        if not os.path.exists(src):
            continue
        dst = table_path(out_dir, t)
        if t in _VERBATIM_TABLES:
            sel = f"SELECT * FROM '{src}'"
        else:
            cols = [
                r[0]
                for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
            ]
            parts = []
            for i in range(factor):
                exprs = []
                for c in cols:
                    fam = _TABLE_KEYS.get(t, {}).get(c)
                    if fam is not None and i > 0:
                        exprs.append(f"{c} + {i * strides[fam]} AS {c}")
                    elif t == "documents" and c == "text" and i > 0:
                        exprs.append(
                            "array_to_string(list_transform("
                            f"string_split(text, ' '), w -> w || '_x{i}'), "
                            f"' ') AS text"
                        )
                    elif t == "documents" and c == "n_chars" and i > 0:
                        exprs.append(
                            "length(array_to_string(list_transform("
                            f"string_split(text, ' '), w -> w || '_x{i}'), "
                            f"' ')) AS n_chars"
                        )
                    elif t == "embeddings" and c == "embedding" and i > 0:
                        exprs.append(
                            f"(embedding[{i + 1}:] || embedding[1:{i}])"
                            f"::FLOAT[] AS embedding"
                        )
                    else:
                        exprs.append(c)
                parts.append(f"SELECT {', '.join(exprs)} FROM '{src}'")
            sel = " UNION ALL ".join(parts)
        # ROW_GROUP_SIZE 8192 (r14): DuckDB's default packs ~123k rows
        # per row group, so a derived documents/embeddings table lands
        # in 1-2 giant row groups and Spark scans — which split on ROW
        # GROUP boundaries, not byte ranges — run the whole
        # tokenize/decode chain on 1-2 tasks at ANY core count. That
        # caps the scaling audit at the fixture, not the engine; real
        # 100 TB inputs have thousands of row groups per file. 8192
        # rows ≈ 1-4 MB groups here — the many-splittable-units layout
        # the audit is supposed to simulate. Values unchanged.
        con.execute(
            f"COPY ({sel}) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)"
        )
        counts[t] = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    con.close()
    return counts


def _time_one(spark, fn, sf_dir, reps):
    """bench.py's per-query discipline: reps samples, then
    unpersist+clearCache so iterative chains don't pay for
    predecessors' orphaned cache blocks."""
    from lightlane_spark.cache import unpersist_all

    out: list[float] = []
    try:
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            out.append(round(time.perf_counter() - t0, 4))
    except Exception as exc:  # noqa: BLE001 — isolate per query
        print(f"scale_ratio: {sf_dir} FAILED: {exc}", file=sys.stderr)
        out = []
    finally:
        unpersist_all()
        spark.catalog.clearCache()
    return out


def _steady(reps: list[float]) -> float | None:
    """Steady-state sample: min of reps 2..n (rep 1 pays one-time
    codegen); min of all if only one rep survived."""
    if not reps:
        return None
    return min(reps[1:]) if len(reps) > 1 else reps[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2, help="reps per scale")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--queries", default=None, help="comma list override")
    ap.add_argument("--out", default=os.path.join(ROOT, "SCALE_RATIO.json"))
    ap.add_argument(
        "--keep", action="store_true", help="keep the derived corpora"
    )
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else AUDIT_QUERIES
    work = args.workdir or tempfile.mkdtemp(prefix="llspark_scale_")
    d1 = os.path.join(work, "x1")
    dn = os.path.join(work, f"x{args.factor}")

    load_start = os.getloadavg()
    t0 = time.perf_counter()
    print(f"scale_ratio: deriving x1 and x{args.factor} under {work}")
    counts1 = derive(args.src, d1, 1)
    countsn = derive(args.src, dn, args.factor)
    derive_sec = round(time.perf_counter() - t0, 1)
    print(f"scale_ratio: derived in {derive_sec}s; rows x1={counts1}")

    import __spark_entry__ as entry_mod
    from lightlane_spark.session import get_spark

    qs = entry_mod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"scale_ratio: unknown queries {missing}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="lightlane-scale-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    # one warm query to pay JVM + parquet-footer first-touch costs
    qs[names[0]](spark, d1).count()

    # INTERLEAVED per query: x1 reps then xN reps back-to-back, so a
    # drifting foreign load on this shared box inflates numerator and
    # denominator of the SAME ratio together instead of hitting one
    # whole phase (run 3 measured pq_topk x1 at 38 s under a load
    # spike that had passed by its x10 phase → ratio 0.06; the
    # phase-sequential design amplified exactly the box noise the
    # bench fought for five rounds). Per-query loadavg is recorded
    # for honesty.
    bar = round(BAR_AT_10X * args.factor / 10.0, 2)
    queries = {}
    over = []
    for i, n in enumerate(names, 1):
        la = os.getloadavg()[0]
        r1 = _time_one(spark, qs[n], d1, args.reps)
        rn = _time_one(spark, qs[n], dn, args.reps)
        t1, tn = _steady(r1), _steady(rn)
        ratio = round(tn / t1, 2) if t1 and tn else None
        queries[n] = {
            "t1": t1,
            f"t{args.factor}": tn,
            "ratio": ratio,
            "reps1": r1,
            f"reps{args.factor}": rn,
            "loadavg": round(la, 2),
        }
        if ratio is None or ratio > bar:
            over.append(n)
        print(
            f"scale_ratio: [{i}/{len(names)}] {n} t1={t1} "
            f"t{args.factor}={tn} ratio={ratio} (load {la:.2f})"
        )
    ratios = sorted(
        v["ratio"] for v in queries.values() if v["ratio"] is not None
    )
    result = {
        "factor": args.factor,
        "src": args.src,
        "bar": bar,
        "over_bar": over,
        "ratio_median": ratios[len(ratios) // 2] if ratios else None,
        "ratio_max": ratios[-1] if ratios else None,
        "derive_sec": derive_sec,
        "rows_x1": counts1,
        f"rows_x{args.factor}": countsn,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM"),
        "idle": load_start[0] <= 1.0,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "queries": queries,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(
        f"scale_ratio: median {result['ratio_median']} max "
        f"{result['ratio_max']} (bar {bar}); over_bar = {over}; "
        f"wrote {args.out}"
    )
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    return 1 if over else 0


if __name__ == "__main__":
    sys.exit(main())
