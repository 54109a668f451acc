#!/usr/bin/env python
"""Within-session persist A/B (VERDICT r5 ask #1): time each target
query best-of-3 with its persist() sites live vs no-op'd, in ONE
session, clearing the cache between arms — the only comparison the
box's load drift can't fake.

Site-selective: DataFrame.persist is wrapped so a run can disable
persists per call-site (``file.py:line``) or globally. Usage:

    python tools/ab_persist.py q1 q2 ...          # on vs all-off
    python tools/ab_persist.py --sites q1 ...     # + one-site-off arms

Prints a table; exits 0 always (measurement tool, not a gate).
"""

from __future__ import annotations

import inspect
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# patch the CLASSIC DataFrame: in Spark 4 the public pyspark.sql
# .DataFrame is a base whose subclass re-defines persist — patching
# the base silently misses every call
from pyspark.sql.classic.dataframe import DataFrame

from lightlane_spark.session import get_spark

_DISABLED: set[str] = set()  # call sites, or "*" for all
_SEEN: set[str] = set()  # sites observed during the current query
_ORIG_PERSIST = DataFrame.persist


def _site_of_caller() -> str:
    fr = inspect.currentframe().f_back.f_back
    # library persists are routed through lightlane_spark/cache.py's
    # tracked_persist (often via DataFrame.transform) — walk past those
    # frames so the reported site stays the OPERATOR's line, not the
    # shared shim
    while fr is not None:
        fn = fr.f_code.co_filename
        if os.path.basename(fn) == "cache.py" or f"{os.sep}pyspark{os.sep}" in fn:
            fr = fr.f_back
            continue
        break
    return f"{os.path.basename(fr.f_code.co_filename)}:{fr.f_lineno}"


def _patched_persist(self, *args, **kwargs):
    site = _site_of_caller()
    _SEEN.add(site)
    if "*" in _DISABLED or site in _DISABLED:
        return self
    return _ORIG_PERSIST(self, *args, **kwargs)


def main() -> None:
    argv = sys.argv[1:]
    per_site = "--sites" in argv
    names = [a for a in argv if not a.startswith("--")]
    if not names:
        raise SystemExit(__doc__)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs = m.queries()
    DataFrame.persist = _patched_persist
    print(f"loadavg at start: {os.getloadavg()}")

    def run(name: str, disabled: set[str]) -> tuple[float, float]:
        _DISABLED.clear()
        _DISABLED.update(disabled)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
            )).count()
            times.append(time.perf_counter() - t0)
            # Spark's cache lookup is PLAN-based: a rebuilt identical
            # plan in reps 2-3 of the persist-ON arm would hit rep 1's
            # cached data while the OFF arm never caches — clearing
            # per rep keeps every rep cold so the arms are comparable
            # (r6 ADVICE).
            spark.catalog.clearCache()
        return min(times), times[0]

    for name in names:
        _SEEN.clear()
        on, on_cold = run(name, set())
        sites = sorted(_SEEN)
        off, off_cold = run(name, {"*"})
        on2, _ = run(name, set())  # drift control: re-measure the on arm
        best_on = min(on, on2)
        verdict = "persist WINS" if best_on <= off else "persist LOSES"
        print(
            f"\n{name}: on={on:.3f}s  all-off={off:.3f}s  on2={on2:.3f}s"
            f"  cold(on/off)={on_cold:.3f}/{off_cold:.3f}s  -> {verdict}"
        )
        print(f"  sites: {sites}")
        if per_site and len(sites) > 1:
            for s in sites:
                t, _ = run(name, {s})
                print(f"  off[{s}]: {t:.3f}s")
    print(f"\nloadavg at end: {os.getloadavg()}")


if __name__ == "__main__":
    main()
