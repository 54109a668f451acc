"""Pin the engine-behavior canary (queries_relational._CANARY_SQL).

The canary's value rests on two facts measured at r11: (1) local
Spark and local DuckDB produce IDENTICAL values for all 9 probes, and
(2) those values are the specific constants below. If a future
Spark/DuckDB upgrade shifts any fingerprint, this test fails loudly
in the suite instead of table_profile silently going red at the
driver — and the failing column names which float class moved
(libm bits, round() path at repr-grid halves, round-half mode at
k=0 / fractional k, decimal→double past 2^53).

Also pins tools/audit_boundaries._repr_half_class, the classifier the
repr-grid audit's pass/fail logic depends on.
"""

import duckdb
import pytest

from lightlane_spark.queries_relational import _CANARY_SQL

# Measured r11 on Spark 4.1.2 + bundled DuckDB (both half-away round,
# repr-path Spark round at repr-halves, shared-libm-identical
# transcendentals on these inputs).
EXPECTED = {
    "can_ln3": 1098612288668109,
    "can_exp15": 448168907033806,
    "can_log10_3": 477121254719662,
    "can_sqrt2": 1414213562373095,
    "can_pow": 1948717100000001,
    # round(2.675, 2)→2.68 on any repr-path half mode (kept digit 7
    # is odd, so even ties-to-even picks 2.68); 267 fingerprints the
    # BINARY path (2.675's double sits below the half)
    # + round(0.0610425, 6)→0.061043×1000
    "can_round_repr": 268 + 61043 * 1000,
    # 3·100 + 4·10 + |−3|: half-away at k=0 (half-even gives
    # 2·100 + 4·10 + 2 = 242)
    "can_round_half": 343,
    # exact dyadic half 61/128 at 6dp: half-away 476563, half-even
    # 476562 — covers the benign exact-half class the repr-grid
    # audit waves through
    "can_round_half6": 476563,
    "can_dec53": 5702160493132716,
}


def test_canary_values_duckdb():
    row = duckdb.connect().execute(f"SELECT {_CANARY_SQL}").fetchdf()
    assert list(row.columns) == list(EXPECTED)
    got = {c: int(row[c][0]) for c in row.columns}
    assert got == EXPECTED


def test_canary_values_spark(spark):
    df = spark.sql(f"SELECT {_CANARY_SQL}")
    assert df.columns == list(EXPECTED)
    assert [t for _, t in df.dtypes] == ["bigint"] * len(EXPECTED)
    got = df.collect()[0].asDict()
    assert got == EXPECTED


@pytest.mark.parametrize(
    "x,k,expected",
    [
        # the measured divergence input: repr on the 6dp half, binary
        # below it (Spark rounds up, DuckDB down)
        (33374.0610425, 6, "inexact"),
        (0.0610425, 6, "inexact"),
        (2.675, 2, "inexact"),
        # dyadic rationals: the double IS the half — both engines
        # round it away identically
        (0.4765625, 6, "exact"),
        (0.1494140625, 9, "exact"),
        (0.125, 2, "exact"),
        (2.5, 0, "exact"),
        # off the grid half entirely
        (0.4765626, 6, None),
        (1.0, 6, None),
        (0.3333333333333333, 6, None),
        # e-notation reprs must not crash or misclassify: 5e-07 is
        # the 6dp half but 5*10^-7 is NOT dyadic, so the binary value
        # sits off the half — the divergence class
        (5e-07, 6, "inexact"),
        (1.5e-07, 6, None),
        (float("inf"), 6, None),
    ],
)
def test_repr_half_class(x, k, expected):
    from tools.audit_boundaries import _repr_half_class

    assert _repr_half_class(x, k) == expected


# ---------------------------------------------------------------------------
# Property tests for the repr-grid audit primitives (review pass r11)
# ---------------------------------------------------------------------------
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=0, max_value=9),
)
def test_repr_half_class_constructive(m, k):
    """Construct x as the double nearest to a true k-dp grid half
    (2m+1)/(2·10^k). When x's shortest repr still reads as that half,
    the classifier must call it: "exact" iff the half is binary-
    representable (only when 5^k divides 2m+1), else "inexact"."""
    from tools.audit_boundaries import _repr_half_class

    half = Decimal(2 * m + 1) / (Decimal(2) * 10**k)
    x = float(half)
    cls = _repr_half_class(x, k)
    if Decimal(repr(x)) == half:
        assert cls == ("exact" if Decimal(x) == half else "inexact")
    else:
        # repr moved off the half — classification must then agree
        # with a direct fraction check of the repr itself
        sh = Decimal(repr(x)).scaleb(k)
        frac = sh - sh.to_integral_value(rounding="ROUND_FLOOR")
        assert (cls is not None) == (frac == Decimal("0.5"))


def test_rewriter_covers_every_round_in_every_oracle():
    """No bare round( may survive rewriting in ANY registry oracle —
    the exact hole (nested rounds) the r11 review found. Paren
    balance must be preserved so the rewritten SQL stays parseable."""
    import re

    import __spark_entry__ as entry
    from tools.audit_boundaries import _mask_inert, _rewrite_rounds

    for name, sql in entry.oracle_sql().items():
        out = _rewrite_rounds(sql)
        # leftover scan on SIGNIFICANT text only: a 'round(' inside a
        # string literal or -- comment is correctly left unrewritten
        # (e.g. burstiness_bots narrates one in a comment)
        leftover = re.search(
            r"(?<!audit_)\bround\s*\(", _mask_inert(out), re.IGNORECASE
        )
        assert not leftover, f"{name}: unrewritten round() survives"
        assert out.count("(") == out.count(")") == sql.count("(")


def test_rewriter_skips_string_literals_and_comments():
    """ADVICE r11 #2: the balanced-paren scan must not treat quoted
    literals (or -- comments) as SQL — a literal containing 'round(',
    a paren, or a depth-1 comma previously miscounted or was falsely
    rewritten, producing broken audit SQL."""
    import pytest

    from tools.audit_boundaries import _rewrite_rounds

    # 'round(' inside a literal: must NOT be rewritten; real one must
    sql = "SELECT round(x, 2), 'call round(y) here' FROM t"
    out = _rewrite_rounds(sql)
    assert out == "SELECT audit_round(x, 2), 'call round(y) here' FROM t"

    # parens + depth-1 comma inside a literal ARGUMENT of round():
    # the scan must not end the call early or see a fake 2nd arg
    sql = "SELECT round(len(concat(s, '(a,b))')) / 7) FROM t"
    out = _rewrite_rounds(sql)
    assert out == "SELECT audit_round(len(concat(s, '(a,b))')) / 7, 0) FROM t"

    # '' escape inside a literal keeps the literal open across it
    sql = "SELECT round(x), 'it''s round(' FROM t"
    assert _rewrite_rounds(sql) == (
        "SELECT audit_round(x, 0), 'it''s round(' FROM t"
    )

    # -- comment text is inert (parens, commas, round( all ignored)
    sql = "SELECT round(x,\n-- round( fake (a,b\n2) FROM t"
    assert _rewrite_rounds(sql) == (
        "SELECT audit_round(x,\n-- round( fake (a,b\n2) FROM t"
    )

    # unbalanced input raises ValueError, not IndexError
    with pytest.raises(ValueError, match="unbalanced"):
        _rewrite_rounds("SELECT round(x")


# ---------------------------------------------------------------------------
# Property tests for the masked rewriter (ADVICE r11 #2 hardening).
# ---------------------------------------------------------------------------

_sql_atoms = st.lists(
    st.one_of(
        st.sampled_from(
            [
                "SELECT ",
                "round(x, 2)",
                "round(x)",
                "sum(y)",
                " FROM t ",
                ", ",
                "(a + b)",
                "'lit(eral, round( t''ick'",
                "-- note round( (a,b\n",
                '/* block round( (a,b */',
                '"quoted id round( (a,b"',
                '"dq "" esc"',
                "x",
            ]
        ),
        st.text(
            alphabet='abc(),\'-\n 0123456789/*"', min_size=0, max_size=12
        ),
    ),
    max_size=8,
)


@settings(max_examples=300, deadline=None)
@given(parts=_sql_atoms)
def test_mask_inert_properties(parts):
    """_mask_inert is length-preserving, never raises, and only ever
    substitutes characters (never reorders): every output position is
    either the input character or '_'."""
    from tools.audit_boundaries import _mask_inert

    sql = "".join(parts)
    masked = _mask_inert(sql)
    assert len(masked) == len(sql)
    assert all(a == b or b == "_" for a, b in zip(sql, masked))


def test_mask_inert_block_comments_and_quoted_identifiers():
    """ADVICE r12 #1: a round(, paren, or depth-1 comma inside a
    /* */ block comment or a double-quoted identifier must be masked
    so the rewriter can neither miscount depth nor falsely rewrite."""
    import re

    from tools.audit_boundaries import _mask_inert, _rewrite_rounds

    sql = (
        'SELECT round(x, 2) AS "weird round( , name", '
        "/* round(dead, code) (unbalanced */ round(y) FROM t"
    )
    masked = _mask_inert(sql)
    assert len(masked) == len(sql)
    # the only live round( heads are the two real calls
    assert len(re.findall(r"round\s*\(", masked)) == 2
    # block-comment and quoted-identifier interiors are fully inert
    assert 'weird' not in masked and 'dead' not in masked
    out = _rewrite_rounds(sql)
    # both live calls rewritten; the quoted identifier and the
    # comment body survive byte-for-byte
    assert out.count("audit_round(") == 2
    assert '"weird round( , name"' in out
    assert "/* round(dead, code) (unbalanced */" in out
    # "" escape inside a quoted identifier does not end the mask
    sql2 = 'SELECT round(a) AS "x "" round(y" FROM t'
    assert _rewrite_rounds(sql2).count("audit_round(") == 1
    # unclosed block comment masks to end-of-string (engine-faithful)
    assert "round" not in _mask_inert("SELECT 1 /* round(")


@settings(max_examples=300, deadline=None)
@given(parts=_sql_atoms)
def test_rewriter_total_on_arbitrary_sql(parts):
    """On arbitrary text the rewriter either returns a rewrite that
    (a) preserves every character outside the rewritten call heads
    and pads, and (b) keeps the original-vs-output length delta
    explainable by its two edit kinds — or raises ValueError
    (unbalanced input), never IndexError/other."""
    from tools.audit_boundaries import _rewrite_rounds

    sql = "".join(parts)
    try:
        out = _rewrite_rounds(sql)
    except ValueError:
        return
    # each rewrite adds 'audit_' (6 chars) and possibly ', 0' (3);
    # nothing else changes length
    delta = len(out) - len(sql)
    heads = out.count("audit_round(")
    pads = delta - 6 * heads
    assert pads % 3 == 0 and 0 <= pads // 3 <= heads
    if heads == 0:
        assert out == sql
