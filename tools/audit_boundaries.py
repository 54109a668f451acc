#!/usr/bin/env python
"""Round-grid boundary audit for the residual `round(ln(...), 9)`
DECIMAL summands (VERDICT r9 ask #5 / SCALE.md taxonomy class 4).

For every transcendental summand row of the four queries that still
round an ln()-derived value at 9dp before pinning it to DECIMAL
(l_diversity, kaplan_meier, mutual_information, theil_decomposition),
compute:

- dist  — the value's distance, in 1e-9 grid units, from the nearest
  round-half boundary (the only place round() results can differ);
- shift — how far, in the same units, a 1-ulp libm difference in the
  ln() result could move the value (|mult|·|ln|·2^-52·1e9).

A row can flip between two correct-to-1ulp libms only if
shift >= dist; `margin = dist/shift` is the safety factor. Run at the
driver's correctness scale (sf0.01) this measures the ACTUAL residual
cross-libm exposure of the frozen data, replacing the r9 "low
probability per row" hand-wave with numbers (r10 result: all four
queries >= 5,958x, i.e. no flippable row exists at sf0.01).

Run: python tools/audit_boundaries.py [sf_dir]
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

from tools.oracle_compare import register_views

con = duckdb.connect()
register_views(con, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

# ---------------------------------------------------------------------------
# Drift guard (r10 review finding): the audit SQL below hand-models
# each query's summand instead of deriving it from the shared ORACLE
# definitions, so a future change to a query's grouping/contribution
# formula would leave this audit silently measuring rows that no
# longer exist. Before measuring anything, assert the distinctive
# summand fragment this audit models still appears verbatim in the
# registry ORACLE string — a shape change then fails HERE instead of
# producing a stale "measured" margin.
# ---------------------------------------------------------------------------
def _check_oracle_shape():
    import __spark_entry__ as entry

    osql = entry.oracle_sql()
    expected = {
        "l_diversity": [
            "round(-CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)), 9)",
            "floor(c_acctbal / 1000)",
        ],
        "kaplan_meier": [
            "round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)",
        ],
        "mutual_information": [
            "ln(CAST(n_xy AS DOUBLE) * n",
        ],
        "theil_decomposition": [
            "ln(CAST(r.x AS DOUBLE)",
        ],
    }
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


_check_oracle_shape()

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

# l_diversity: x = -cnt*ln(cnt) per (nation, segment, bucket) class row
rows = con.execute("""
    WITH per AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS sbucket, count(*) AS cnt
        FROM customer GROUP BY 1,2,3)
    SELECT -CAST(cnt AS DOUBLE)*ln(CAST(cnt AS DOUBLE)), CAST(cnt AS DOUBLE), CAST(cnt AS DOUBLE) FROM per
""").fetchall()
audit("l_diversity  -cnt*ln(cnt)", [(r[0], r[1], r[2]) for r in rows])

# kaplan_meier: x = ln(1 - d/n_risk) where d < n_risk
rows = con.execute("""
    WITH s AS (SELECT user_id, min(ts) AS signup FROM events
               WHERE event_type='signup' GROUP BY 1 HAVING min(ts) < TIMESTAMP '2024-01-08'),
    p AS (SELECT e.user_id, min(e.ts) AS purch FROM events e JOIN s USING (user_id)
          WHERE e.event_type='purchase' AND e.ts > s.signup GROUP BY 1),
    obs AS (SELECT s.user_id % 2 AS variant,
               CASE WHEN p.purch IS NOT NULL AND p.purch < TIMESTAMP '2024-01-08'
                    THEN date_diff('day', CAST(s.signup AS DATE), CAST(p.purch AS DATE))
                    ELSE date_diff('day', CAST(s.signup AS DATE), DATE '2024-01-08') END AS t,
               CASE WHEN p.purch IS NOT NULL AND p.purch < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END AS is_event
            FROM s LEFT JOIN p USING (user_id)),
    day AS (SELECT variant, t, SUM(is_event) AS d, SUM(1-is_event) AS c FROM obs GROUP BY 1,2),
    tot AS (SELECT variant, SUM(d+c) AS cohort FROM day GROUP BY 1),
    km AS (SELECT day.variant, t, d, c,
               cohort - coalesce(SUM(d+c) OVER (PARTITION BY day.variant ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
           FROM day JOIN tot ON day.variant = tot.variant)
    SELECT ln(1.0 - CAST(d AS DOUBLE)/CAST(n_risk AS DOUBLE)), 1.0 - CAST(d AS DOUBLE)/CAST(n_risk AS DOUBLE), CAST(1.0 AS DOUBLE)
    FROM km WHERE d < n_risk
""").fetchall()
audit("kaplan_meier ln(1-d/n)", [(r[0], r[1], r[2]) for r in rows])

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
