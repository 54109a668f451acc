#!/usr/bin/env python
"""Round-13 optimization helper: STAGE-level attribution for one or
more queries (guide §1.1/§7.1). Runs each query with the Spark UI
enabled and pulls /api/v1/applications/<id>/stages, printing per-stage
task count, executor run time, input/shuffle bytes and the stage name
— the data needed to tell a starved (few-task, compute-dense) stage
from a genuinely cheap one.

Run: python tools/r14/profile_stages.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from lightlane_spark.cache import unpersist_all  # noqa: E402
from lightlane_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    targets = sys.argv[1:]
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    try:
        from bench import _bench_only_overrides

        qs.update(_bench_only_overrides())
    except Exception:
        pass
    spark = get_spark(
        app_name="lightlane-stage-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"
    app_id = spark.sparkContext.applicationId

    def all_stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    # warm
    qs["pricing_summary"](spark, sf_dir).count()

    for name in targets:
        if name not in qs:
            print(f"skip {name}: not in queries()", file=sys.stderr)
            continue
        walls = []
        for rep in range(3):
            floor = max((s["stageId"] for s in all_stages()), default=-1)
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
            if rep == 2:
                stages = [s for s in all_stages() if s["stageId"] > floor]
                stages.sort(key=lambda s: -s.get("executorRunTime", 0))
                print(
                    f"{name}: walls={[round(w, 3) for w in walls]} "
                    f"stages={len(stages)}"
                )
                for s in stages[:10]:
                    print(
                        f"    stage {s['stageId']}: run={s['executorRunTime'] / 1e3:.3f}s "
                        f"tasks={s['numCompleteTasks']} "
                        f"in={s.get('inputBytes', 0) >> 10}K "
                        f"sr={s.get('shuffleReadBytes', 0) >> 10}K "
                        f"sw={s.get('shuffleWriteBytes', 0) >> 10}K "
                        f"{(s.get('name') or '')[:60]}"
                    )
        unpersist_all()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
