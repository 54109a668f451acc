#!/usr/bin/env python
"""Generate the driver-correctness rotation (``_RECHECK``) from the
committed ``CORRECTNESS_r*.json`` history instead of hand-curating it.

The round driver truncates its correctness check at 50 queries, taken
in ``queries()`` order. VERDICT r7 ask #3: the hand-maintained list
mis-rotated twice (r6: not at all; r7: 30 new queries crowded out the
named stale set), so this tool derives the order mechanically:

  1. RED    — queries whose LATEST driver row has any of
              rows/schema/hash false OR err set (``no_oracle`` rows
              count: they never had a full hash check and must earn
              one); most-recent-red first so regressions surface
              immediately.
  2. CHANGED — names passed via ``--changed a,b,c`` (or one-per-line
              in a file via ``--changed-file``): queries whose
              implementation or oracle changed since the last driver
              row. Hand-declared because git can't map diffs→queries.
  3. NEVER  — queries with no driver row in ANY committed round,
              registry order (stable).
  4. GREEN  — driver-green queries, OLDEST last-checked round first;
              ties broken by registry order. A query green in r1 and
              never re-checked outranks one green in r6. ``--pin``
              names jump to the FRONT of this bucket (keeping their
              relative --pin order): used for the SURVEY §2
              relational/loader core, which the judge wants
              re-checked ahead of long-tail analytics queries of
              equal staleness (VERDICT r7 ask #1).

Within each bucket the order is deterministic, so two runs at the same
HEAD agree. Output: the ordered name list, one per line, with a
``# slot N`` comment every 10 and a marker at the 50-slot window edge;
``--python`` emits a paste-ready ``_RECHECK = [...]`` literal with
bucket comments.

Run:  python tools/rotate_window.py [--changed a,b] [--python]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WINDOW = 50


def load_history() -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a driver row, was that row green)."""
    hist: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            prev = hist.get(name)
            if prev is None or rnd >= prev[0]:
                hist[name] = (rnd, green)
    return hist


def registry_names() -> list[str]:
    """Declared query names in stable registry (insertion) order,
    without the ordering layer this tool itself feeds."""
    import __spark_entry__ as entry

    return list(entry._queries_unordered())


def rotate(
    changed: list[str], pinned: list[str] | None = None
) -> tuple[list[str], dict[str, str]]:
    hist = load_history()
    names = registry_names()
    changed_set = {c for c in changed if c in names}
    missing = [c for c in changed if c not in names]
    if missing:
        raise SystemExit(f"--changed names not in queries(): {missing}")
    bad_pins = [p for p in (pinned or []) if p not in names]
    if bad_pins:
        raise SystemExit(f"--pin names not in queries(): {bad_pins}")
    pinned = list(pinned or [])

    red = [n for n in names if n in hist and not hist[n][1]]
    red.sort(key=lambda n: (-hist[n][0], names.index(n)))
    chg = [n for n in names if n in changed_set and n not in red]
    never = [n for n in names if n not in hist and n not in changed_set]
    green = [
        n
        for n in names
        if n in hist and hist[n][1] and n not in changed_set
    ]
    pin_rank = {n: i for i, n in enumerate(pinned)}
    green.sort(
        key=lambda n: (
            pin_rank.get(n, len(pin_rank)),
            hist[n][0],
            names.index(n),
        )
    )

    order = red + chg + never + green
    bucket = {n: "red" for n in red}
    bucket.update({n: "changed" for n in chg})
    bucket.update({n: "never" for n in never})
    bucket.update(
        {
            n: f"pinned (green r{hist[n][0]})"
            if n in pin_rank
            else f"green r{hist[n][0]}"
            for n in green
        }
    )
    return order, bucket


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changed", default="", help="comma-separated names")
    ap.add_argument("--changed-file", default="", help="one name per line")
    ap.add_argument(
        "--pin",
        default="",
        help="comma-separated names boosted to the front of the green "
        "bucket (SURVEY §2 core)",
    )
    ap.add_argument(
        "--python", action="store_true", help="emit a _RECHECK literal"
    )
    args = ap.parse_args()

    changed = [c.strip() for c in args.changed.split(",") if c.strip()]
    if args.changed_file:
        with open(args.changed_file) as fh:
            changed += [ln.strip() for ln in fh if ln.strip()]

    pinned = [p.strip() for p in args.pin.split(",") if p.strip()]
    order, bucket = rotate(changed, pinned)

    if args.python:
        print("_RECHECK = [")
        print("    # generated by tools/rotate_window.py — do not hand-edit;")
        print("    # re-run with --changed <names> after semantic changes.")
        last = None
        for i, n in enumerate(order):
            b = bucket[n]
            if b != last:
                print(f"    # --- {b} ---")
                last = b
            mark = "  # end of 50-slot driver window" if i == WINDOW - 1 else ""
            print(f'    "{n}",{mark}')
        print("]")
    else:
        for i, n in enumerate(order):
            edge = "  <== window edge" if i == WINDOW - 1 else ""
            print(f"{i + 1:3d} {bucket[n]:>10s}  {n}{edge}")


if __name__ == "__main__":
    main()
