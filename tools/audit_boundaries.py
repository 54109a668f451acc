#!/usr/bin/env python
"""Two numeric-divergence audits over the hashed registry outputs.

AUDIT 1 — libm margin (VERDICT r9 ask #5 / SCALE.md taxonomy class
4): for the queries that still round an ln()-derived summand at 9dp
before pinning it to DECIMAL (mutual_information,
theil_decomposition — l_diversity and kaplan_meier left this class
in r11 when their outputs went pure-integer), measure each row's
distance from the nearest round-half boundary against the shift a
1-ulp libm difference could produce. A row can flip between two
correct-to-1ulp libms only if shift >= dist; margin = dist/shift.

AUDIT 2 — repr-grid halves (VERDICT r10 ask #2): Spark's
round(double, k) rounds the value's SHORTEST DECIMAL REPR (through
BigDecimal.valueOf) while DuckDB rounds the BINARY value — measured
divergence on 33374.0610425 at 6dp (repr is the exact half → Spark
up; binary sits below → DuckDB down). This divergence needs no libm
and no binary-boundary proximity: it fires exactly when a pre-round
double's shortest repr lands on a k-dp grid half. This audit finds
every such row MECHANICALLY: it textually renames ``round(`` to a
recording DuckDB Python UDF in every registry ORACLE that rounds,
runs the rewritten SQL, and checks each captured pre-round double's
shortest repr (via Decimal(repr(x))) for an exact half at its k.
Any hit = that query's rounded column can hash-diverge on an engine
build that takes the other path → convert the emit (drop the round
or go integer). Expected output: zero hits at sf0.01 and sf0.1.

Run: python tools/audit_boundaries.py [sf_dir]
"""
import math
import os
import re
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

from tools.oracle_compare import register_views

# Set inside main() — module import must stay side-effect-free so
# tests can import the classifier/rewriter helpers.
SF_DIR = None
con = None

# ---------------------------------------------------------------------------
# Drift guard (r10 review finding): audit 1 hand-models each query's
# summand instead of deriving it from the shared ORACLE definitions,
# so a shape change to the query must fail HERE instead of producing
# a stale "measured" margin.
# ---------------------------------------------------------------------------
def _check_oracle_shape():
    import __spark_entry__ as entry

    osql = entry.oracle_sql()
    expected = {
        "mutual_information": [
            "ln(CAST(n_xy AS DOUBLE) * n",
        ],
        "theil_decomposition": [
            "ln(CAST(r.x AS DOUBLE)",
        ],
    }
    # r11: these two left the round(ln) class entirely (pure-integer
    # outputs); if a round(ln( ever reappears in them, audit 1 must
    # grow a block for the new shape.
    for q in ("l_diversity", "kaplan_meier"):
        if "round(" in osql[q].lower():
            sys.exit(
                f"audit_boundaries.py: {q} was integer-only (r11) but its "
                "oracle rounds again — add an audit-1 block for the new shape."
            )
    stale = [
        f"{q}: {frag!r}"
        for q, frags in expected.items()
        for frag in frags
        if frag not in osql[q]
    ]
    if stale:
        sys.exit(
            "audit_boundaries.py models summands that no longer match the "
            "registry ORACLE SQL — update the audit queries below to the new "
            "shape before trusting any margin it prints:\n  "
            + "\n  ".join(stale)
        )



def audit(name, rows):
    worst = None
    for (x, ln_arg, mult) in rows:
        # x = value being rounded at 9dp; ln component ln(ln_arg), scaled by mult
        g = x * 1e9
        dist = abs(g - math.floor(g) - 0.5)     # grid units to the half boundary
        ln_v = math.log(ln_arg)
        shift = abs(mult) * abs(ln_v) * 2.0**-52 * 1e9  # 1-ulp libm wiggle in grid units
        margin = dist / shift if shift > 0 else float('inf')
        if worst is None or margin < worst[0]:
            worst = (margin, x, dist, shift)
    if worst is None:
        print(f"{name}: n=0 (no qualifying summand rows at this SF)")
        return
    print(f"{name}: n={len(rows)} worst margin = {worst[0]:.1f}x  (dist {worst[2]:.4f} grid units vs 1-ulp shift {worst[3]:.2e})")



# ---------------------------------------------------------------------------
# AUDIT 2 — repr-grid halves across EVERY rounding oracle, mechanically.
# ---------------------------------------------------------------------------
_captured: list[tuple[float, int]] = []


def _audit_round(x: float, k: int) -> float:
    # record the PRE-round double and its grid, return a round value
    # (downstream values are irrelevant to this audit — the capture
    # happens regardless of what the rewritten query emits). Guarded:
    # non-finite x and values whose |x|·10^k needs more digits than
    # the default Decimal context would raise InvalidOperation inside
    # the DuckDB UDF and masquerade as a REWRITE-FAILED — a value
    # outside the helper's envelope is NOT a broken rewrite (review
    # finding r11); it still gets captured and classified.
    # CONTRACT (ADVICE r11 #3): the UDF's first argument is DOUBLE, so
    # a round() over a DECIMAL expression is captured AFTER DuckDB's
    # implicit decimal->double conversion — an exact decimal grid-half
    # (e.g. a scale-3 decimal ending in 5 rounded at 2dp) would then
    # classify "inexact" even though decimal rounding is exact and
    # engine-identical: a FALSE-POSITIVE audit failure, never a missed
    # divergence (the audit stays conservative). Rounding oracles must
    # therefore CAST(... AS DOUBLE) before round() so the captured
    # value is the one the engines actually round; if a decimal-round
    # oracle ever trips this audit, convert that oracle, not this UDF.
    if x is None:
        return None
    x, k = float(x), int(k)
    _captured.append((x, k))
    if not math.isfinite(x):
        return x
    import decimal as _d

    with _d.localcontext() as ctx:
        ctx.prec = 60
        q = Decimal(repr(x)).quantize(Decimal(1).scaleb(-k))
    return float(q)


def _repr_half_class(x: float, k: int) -> str | None:
    """Classify x against the k-dp repr grid.

    - None: shortest repr is not on a grid half — round() paths agree.
    - "exact": repr is a half AND the double is binary-EXACT at it
      (dyadic rational, e.g. 0.4765625 = 61/128 at 6dp): Spark's
      repr-path HALF_UP and DuckDB's binary-path half-away see the
      SAME exact half and both round away — agreement by
      construction, verified by the canary's own 0.125/2.5 probes.
      Flip risk exists only under a half-EVEN build, which flips the
      can_round_half canary column first (table_profile goes red and
      localizes it). Reported, not failing.
    - "inexact": repr is a half but the binary value is NOT the half
      (e.g. 33374.0610425, binary below) — the MEASURED divergence
      class (Spark rounds the repr up, DuckDB the binary value
      down). Any hit here fails the audit: convert that emit.

    Exact decimal arithmetic on repr(x), so e-notation is handled.
    """
    if not math.isfinite(x):
        return None
    shortest = Decimal(repr(x))
    shifted = shortest.scaleb(k)
    frac = shifted - shifted.to_integral_value(rounding="ROUND_FLOOR")
    if frac != Decimal("0.5"):
        return None
    return "exact" if Decimal(x) == shortest else "inexact"


def _mask_inert(sql: str) -> str:
    """Same-length copy of ``sql`` with every character inside a
    single-quoted literal (incl. the quotes; '' escapes handled), a
    double-quoted identifier ("" escapes handled), a ``--`` line
    comment, or a ``/* */`` block comment replaced by '_', so the
    rewriter's pattern search and balanced-paren scan can never match
    a ``round(``, a paren, or a depth-1 comma that lives in
    literal/identifier/comment text (ADVICE r11 #2 for literals and
    line comments; ADVICE r12 #1 extended the mask to block comments
    and quoted identifiers — no registry oracle uses those today, but
    nothing prevents a future one). Block comments do NOT nest in
    DuckDB/ANSI, so the scan ends at the first ``*/``; an unclosed
    block comment masks to end-of-string, matching how the engine
    would treat it. Indices stay aligned — slices for output text
    come from the ORIGINAL sql."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"'):
            q = ch
            out[i] = "_"
            i += 1
            while i < n:
                if sql[i] == q:
                    if i + 1 < n and sql[i + 1] == q:  # '' / "" escape
                        out[i] = out[i + 1] = "_"
                        i += 2
                        continue
                    out[i] = "_"
                    i += 1
                    break
                out[i] = "_"
                i += 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                out[i] = "_"
                i += 1
        elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
            out[i] = out[i + 1] = "_"
            i += 2
            while i < n:
                if sql[i] == "*" and i + 1 < n and sql[i + 1] == "/":
                    out[i] = out[i + 1] = "_"
                    i += 2
                    break
                out[i] = "_"
                i += 1
        else:
            i += 1
    return "".join(out)


def _rewrite_rounds(sql: str) -> str:
    """Rename every round(...) call to audit_round(...), padding
    single-arg calls with ', 0' (round-to-integer grid) so one UDF
    signature covers both arities. Balanced-paren scan, no regex
    arity guessing. RECURSES into each call's argument text so
    nested rounds — e.g. round(list_max(list_transform(v, x ->
    round(x / s) * s)), 9) in embedding_quantize_error — are
    captured too; a non-recursive rewrite left the inner call native
    and uncaptured while the audit claimed full coverage (review
    finding r11). Pattern search and paren scan run on a MASKED copy
    (string literals and -- comments blanked, see ``_mask_inert``)
    while output slices come from the original text, and unbalanced
    input raises ValueError instead of IndexError."""
    pat = re.compile(r"\bround\s*\(", re.IGNORECASE)
    masked = _mask_inert(sql)
    out, pos = [], 0
    while True:
        m = pat.search(masked, pos)
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        out.append(sql[pos:m.start()])
        depth, i = 1, m.end()
        commas = 0
        while depth:
            if i >= len(masked):
                raise ValueError(
                    f"unbalanced parens scanning round() at {m.start()}"
                )
            ch = masked[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                commas += 1
            i += 1
        inner = _rewrite_rounds(sql[m.end():i - 1])
        pad = "" if commas else ", 0"
        out.append(f"audit_round({inner}{pad})")
        pos = i


# table_profile's rounds are the engine-behavior CANARY probes
# (_CANARY_SQL): constants placed ON repr-grid halves DELIBERATELY,
# verified value-identical across both local engines, whose entire
# purpose is to turn that one query red if a driver-side build takes
# the other round() path. Not a latent red — the intended detector.
_DELIBERATE = {"table_profile"}


def repr_grid_audit():
    import __spark_entry__ as entry

    osql = entry.oracle_sql()
    try:
        con.create_function(
            "audit_round", _audit_round, ["DOUBLE", "INTEGER"], "DOUBLE"
        )
    except Exception as exc:  # pragma: no cover — old duckdb builds
        print(f"repr-grid audit SKIPPED (no Python UDF support): {exc}")
        return

    pat = re.compile(r"\bround\s*\(", re.IGNORECASE)
    rounding = {
        n: sql
        for n, sql in osql.items()
        if pat.search(sql) and n not in _DELIBERATE
    }
    print(f"\nrepr-grid audit: {len(rounding)} rounding oracles at {SF_DIR}")
    inexact_total = 0
    exact_total = 0
    failed = []
    for name in sorted(rounding):
        _captured.clear()
        try:
            con.execute(_rewrite_rounds(rounding[name])).fetchall()
        except Exception as exc:  # noqa: BLE001 — report, keep auditing
            failed.append((name, f"{type(exc).__name__}: {str(exc)[:120]}"))
            continue
        inexact, exact = [], []
        for (x, k) in _captured:
            cls = _repr_half_class(x, k)
            if cls == "inexact":
                inexact.append((x, k))
            elif cls == "exact":
                exact.append((x, k))
        inexact_total += len(inexact)
        exact_total += len(exact)
        status = "ok"
        if exact:
            status = f"exact-dyadic-half n={len(exact)} {exact[:3]} (benign, canary-covered)"
        if inexact:
            status = f"INEXACT-HALF HIT {inexact[:5]}"
        print(f"  {name}: n_pre_round={len(_captured)} {status}")
    for name, err in failed:
        print(f"  {name}: REWRITE-FAILED {err}")
    print(
        f"repr-grid audit DONE: {inexact_total} inexact repr-half hits "
        f"(divergence class — must be 0), {exact_total} exact dyadic halves "
        f"(both engines round these identically; a half-even build flips "
        f"the can_round_half canary first), {len(failed)} rewrite failures "
        f"(table_profile excluded: canary probes sit on halves by design)"
    )
    if inexact_total or failed:
        sys.exit(1)


def main() -> None:
    global SF_DIR, con
    SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    register_views(con, SF_DIR)
    _check_oracle_shape()

    # mutual_information: x = (n_xy/n) * ln(n_xy*n/(n_x*n_y))
    rows = con.execute("""
        WITH f AS (SELECT event_type, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events),
        feats AS (
            SELECT event_type, 'leaky' AS feature,
                   CASE WHEN event_type='purchase' THEN 4 + k % 2 ELSE k % 4 END AS fval FROM f
            UNION ALL SELECT event_type, 'clean', k % 4 FROM f),
        jt AS (SELECT feature, event_type, fval, count(*) AS n_xy FROM feats GROUP BY 1,2,3),
        mx AS (SELECT feature, event_type, SUM(n_xy) AS n_x FROM jt GROUP BY 1,2),
        my AS (SELECT feature, fval, SUM(n_xy) AS n_y FROM jt GROUP BY 1,2),
        nn AS (SELECT feature, SUM(n_xy) AS n FROM jt GROUP BY 1)
        SELECT (CAST(n_xy AS DOUBLE)/CAST(n AS DOUBLE))
                 * ln(CAST(n_xy AS DOUBLE)*CAST(n AS DOUBLE)/(CAST(n_x AS DOUBLE)*CAST(n_y AS DOUBLE))),
               CAST(n_xy AS DOUBLE)*CAST(n AS DOUBLE)/(CAST(n_x AS DOUBLE)*CAST(n_y AS DOUBLE)),
               CAST(n_xy AS DOUBLE)/CAST(n AS DOUBLE)
        FROM jt JOIN mx USING (feature, event_type)
                JOIN my ON my.feature=jt.feature AND my.fval=jt.fval
                JOIN nn ON nn.feature=jt.feature
    """).fetchall()
    audit("mutual_info  (p)ln(ratio)", [(float(r[0]), float(r[1]), float(r[2])) for r in rows])

    # theil: x = (x/mu)*ln(x/mu) per customer
    rows = con.execute("""
        WITH rev AS (SELECT c.c_mktsegment AS seg, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
                     FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                     GROUP BY c.c_mktsegment, o.o_custkey),
        seg AS (SELECT seg, count(*) AS n_g, SUM(x) AS sx_g FROM rev GROUP BY 1)
        SELECT (CAST(r.x AS DOUBLE)/(CAST(s.sx_g AS DOUBLE)/s.n_g))
                 * ln(CAST(r.x AS DOUBLE)/(CAST(s.sx_g AS DOUBLE)/s.n_g)),
               CAST(r.x AS DOUBLE)/(CAST(s.sx_g AS DOUBLE)/s.n_g),
               CAST(r.x AS DOUBLE)/(CAST(s.sx_g AS DOUBLE)/s.n_g)
        FROM rev r JOIN seg s USING (seg)
    """).fetchall()
    audit("theil (r)ln(r)", [(float(r[0]), float(r[1]), float(r[2])) for r in rows])

    repr_grid_audit()


if __name__ == "__main__":
    main()
