#!/usr/bin/env python
"""Round-13 optimization helper: dump .explain('formatted') for a set
of queries into plans/r14/<query>_<tag>.txt and time each with the
noop sink (guide §1.4) at the bench SF.

Run: python tools/r14/capture_plans.py <tag> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from lightlane_spark.cache import unpersist_all  # noqa: E402
from lightlane_spark.session import get_spark  # noqa: E402

DEFAULT_TARGETS = [
    "bpe_train",
    "neardup_dedup_quality",
    "hybrid_retrieval",
    "neardup_clusters",
    "kcore_peel",
    "leakage_safe_split",
    "ann_topk_lsh",
    "bucketed_join",
    "minhash_lsh_pairs",
    "compacted_load",
    "ann_topk_ivf",
    "label_propagation",
    "frequent_pairs",
    "bow_similarity",
    "range_split",
    "join_size_estimate",
    "minhash_join",
    "pricing_summary",
    "containment_join",
    "cooccurrence_pmi",
    "point_in_time_join",
    "dpp_scan",
    "psi_drift",
    "set_similarity_join",
    "pq_topk",
    "semantic_dedup",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    targets = sys.argv[2:] or DEFAULT_TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from bench import _bench_only_overrides

    qs = entry_mod.queries()
    qs.update(_bench_only_overrides())
    spark = get_spark(app_name=f"r14-capture-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    qs["pricing_summary"](spark, sf_dir).count()  # warm JVM/footers

    out_dir = os.path.join(_ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    timings: dict[str, list[float]] = {}
    for name in targets:
        if name not in qs:
            print(f"skip {name}: not in queries()", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"r14:{tag}:{name}")
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps.append(round(time.perf_counter() - t0, 4))
            timings[name] = reps
            print(f"{name}: {reps}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name} FAILED: {exc}", file=sys.stderr)
            timings[name] = []
        finally:
            unpersist_all()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    with open(os.path.join(out_dir, f"_timings_{tag}.json"), "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "loadavg": os.getloadavg(), "reps": timings},
            fh,
            indent=1,
            sort_keys=True,
        )
    print(json.dumps({n: (min(r[1:]) if len(r) > 1 else None) for n, r in timings.items()}))


if __name__ == "__main__":
    main()
