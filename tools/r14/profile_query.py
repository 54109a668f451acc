#!/usr/bin/env python
"""Round-13 optimization helper: job-level attribution for one or
more queries (guide §1.1/§7.1). Runs each query with the Spark UI
enabled, then pulls /api/v1/applications/<id>/jobs and groups job
wall/task time under the rep that submitted it — showing how much of
a query's wall clock is executor work vs driver-side planning and
scheduling, and how many jobs (actions) the query issues per run.

Run: python tools/r14/profile_query.py <query> [query ...]
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
    targets = sys.argv[1:]
    if not targets:
        print("usage: profile_query.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from bench import _bench_only_overrides

    qs = entry_mod.queries()
    qs.update(_bench_only_overrides())
    spark = get_spark(
        app_name="r14-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs["pricing_summary"](spark, sf_dir).count()  # warm JVM/footers

    def all_jobs():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            return json.load(r)

    def jobs_after(job_floor: int):
        return [j for j in all_jobs() if j["jobId"] > job_floor]

    for name in targets:
        if name not in qs:
            print(f"skip {name}: not in queries()", file=sys.stderr)
            continue
        for rep in range(3):
            floor = max((j["jobId"] for j in all_jobs()), default=-1)
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            wall = time.perf_counter() - t0
            jobs = jobs_after(floor)
            njobs = len(jobs)
            # job wall = completion - submission per job; task time from
            # stage metrics is not in the jobs payload, so report job
            # wall sum (overlapping jobs can exceed query wall).
            from datetime import datetime

            def _ts(s):
                return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

            jw = sum(
                _ts(j["completionTime"]) - _ts(j["submissionTime"])
                for j in jobs
                if j.get("completionTime")
            )
            ntasks = sum(j.get("numTasks", 0) for j in jobs)
            print(
                f"{name} rep{rep}: wall={wall:.3f}s jobs={njobs} "
                f"job_wall_sum={jw:.3f}s tasks={ntasks}",
                flush=True,
            )
            if rep == 2:
                slowest = sorted(
                    (
                        (
                            _ts(j["completionTime"]) - _ts(j["submissionTime"]),
                            j["jobId"],
                            j.get("numTasks", 0),
                            (j.get("description") or j.get("name", ""))[:90],
                        )
                        for j in jobs
                        if j.get("completionTime")
                    ),
                    reverse=True,
                )[:8]
                for dt, jid, nt, desc in slowest:
                    print(f"    job {jid}: {dt:.3f}s tasks={nt} {desc}")
        unpersist_all()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
