#!/usr/bin/env python
"""Promote a bench detail artifact to BENCH_IDLE.json — but ONLY if
the run was tagged idle (VERDICT r12 ask #3: BENCH_IDLE must be
structurally unable to contain a loaded-box measurement, so the
round-close needs no manual triplet adjudication).

bench.py already does this automatically for a failure-free sf0.1
run; this tool exists for promoting an older BENCH_DETAIL.json by
hand. The guard itself lives in bench.refresh_bench_idle — one
definition.

Run: python tools/refresh_bench_idle.py [--from BENCH_DETAIL.json]
Exit: 0 on refresh, 2 on refusal (not idle / failed queries / wrong SF).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import refresh_bench_idle  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--from",
        dest="src",
        default=os.path.join(ROOT, "BENCH_DETAIL.json"),
        help="detail artifact to promote (default: repo BENCH_DETAIL.json)",
    )
    args = ap.parse_args()
    with open(args.src) as fh:
        detail = json.load(fh)
    if detail.get("failed"):
        print(
            f"refusing: artifact has failed queries {detail['failed']}",
            file=sys.stderr,
        )
        return 2
    if detail.get("sf") != 0.1:
        print(
            f"refusing: artifact sf={detail.get('sf')!r}, the BENCH_IDLE "
            "series is sf0.1",
            file=sys.stderr,
        )
        return 2
    ok = refresh_bench_idle(detail, os.path.join(ROOT, "BENCH_IDLE.json"))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
