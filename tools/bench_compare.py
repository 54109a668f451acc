#!/usr/bin/env python
"""Diff two bench JSON outputs: per-query ratios, biggest moves, and
like-for-like totals over the shared query set.

Usage: python tools/bench_compare.py OLD.json NEW.json

Accepts either the raw ``bench.py`` output line or a driver
``BENCH_r{N}.json`` wrapper (the bench line is then extracted from
its ``tail`` field).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "tail" in d:
        m = re.search(r'\{"metric".*\}', d["tail"])
        if not m:
            raise SystemExit(f"{path}: no bench line found in driver wrapper")
        d = json.loads(m.group(0))
    return {k: v for k, v in d["queries"].items() if v is not None}


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    shared = sorted(set(old) & set(new))
    rows = [(k, old[k], new[k], new[k] / old[k]) for k in shared]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':28s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    for k, a, b, r in rows:
        flag = " <-- " if r > 1.3 or r < 0.7 else ""
        print(f"{k:28s} {a:8.3f} {b:8.3f} {r:6.2f}{flag}")
    so, sn = sum(old[k] for k in shared), sum(new[k] for k in shared)
    print(
        f"\nshared {len(shared)} queries: {so:.2f}s -> {sn:.2f}s "
        f"({(sn / so - 1) * 100:+.1f}%)"
    )
    for label, extra in (("only-old", set(old) - set(new)), ("only-new", set(new) - set(old))):
        if extra:
            print(f"{label}: {', '.join(sorted(extra))}")


if __name__ == "__main__":
    main()
