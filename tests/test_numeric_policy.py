"""Static enforcement of the cross-engine numeric-output policy
(SCALE.md, "Cross-engine numeric-output taxonomy"): no rounded
transcendental may appear in a query or oracle except as a summand
that is immediately pinned to DECIMAL (the char_entropy contract).

The r7/r8 driver reds were exactly this class — round(exp/ln(...), 6)
in hashed output flipping at a rounding-grid boundary on a different
libm/round implementation. These tests scan the query sources so the
pattern cannot be reintroduced silently; they parse string literals
via ast (only SQL-looking ones), so prose in docstrings that mentions
the banned pattern does not false-positive.
"""

from __future__ import annotations

import ast
import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY_FILES = sorted(
    glob.glob(os.path.join(REPO, "lightlane_spark", "queries_*.py"))
    + [
        os.path.join(REPO, "lightlane_spark", "operators", "text.py"),
        os.path.join(REPO, "__spark_entry__.py"),
    ]
)

# round( ln(...)/exp(...) ... ) in SQL text; allowed only when the
# rounded value is immediately CAST to DECIMAL (summand contract)
_SQL_ROUND_TRANS = re.compile(r"round\(\s*\(?\s*(ln|exp)\s*\(", re.IGNORECASE)


def _sql_literals(path: str):
    tree = ast.parse(open(path).read(), filename=path)
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            s = node.value
            if "SELECT" in s.upper():
                yield node.lineno, s


def test_no_unpinned_round_transcendental_in_oracle_sql():
    bad = []
    for path in QUERY_FILES:
        for lineno, sql in _sql_literals(path):
            for m in _SQL_ROUND_TRANS.finditer(sql):
                # the summand contract: CAST(round(...) AS DECIMAL...)
                # — look for DECIMAL shortly after the match
                window = sql[m.start() : m.start() + 300]
                if "DECIMAL" not in window.upper():
                    bad.append(
                        f"{os.path.relpath(path, REPO)}:{lineno} "
                        f"...{window[:80]!r}"
                    )
    assert not bad, (
        "round(ln/exp(...)) without a DECIMAL pin in oracle SQL "
        "(r7/r8 driver-red class):\n" + "\n".join(bad)
    )


# F.round(F.log/F.exp(...), k) on the Spark side; allowed only when
# the expression is pinned with .cast("decimal...") nearby
_PY_ROUND_TRANS = re.compile(
    r"F\.round\(\s*-?\s*\(?\s*F\.(log|exp)\b|"
    r"F\.round\(\s*F\.col\([^)]*\)[^,\n]*\*\s*F\.(log|exp)\b"
)


def test_no_unpinned_round_transcendental_in_spark_code():
    bad = []
    for path in QUERY_FILES:
        src = open(path).read()
        for m in _PY_ROUND_TRANS.finditer(src):
            window = src[m.start() : m.start() + 400]
            if '.cast("decimal' not in window:
                lineno = src[: m.start()].count("\n") + 1
                bad.append(
                    f"{os.path.relpath(path, REPO)}:{lineno} "
                    f"...{window[:80]!r}"
                )
    assert not bad, (
        "F.round over a transcendental without a decimal pin "
        "(r7/r8 driver-red class):\n" + "\n".join(bad)
    )
