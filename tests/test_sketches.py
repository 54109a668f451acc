"""Count-min sketch and Bloom filter: exactness of the portable hash
arithmetic (DuckDB twin), CMS over-count bound, merge = rebuild,
Bloom no-false-negatives, and the broadcast-only plan shape."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from lightlane_spark.operators.sketches import (
    bloom_build,
    bloom_member,
    cms_build,
    cms_estimate,
    cms_estimate_sql,
    cms_merge,
    position_sql,
)

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
]


@pytest.fixture(scope="module")
def tokens(spark):
    # Zipf-ish: word i appears (i+1)^2 times
    rows = [(w,) for i, w in enumerate(WORDS) for _ in range((i + 1) ** 2)]
    return spark.createDataFrame(rows, "tok: string")


def test_position_sql_matches_both_engines(spark):
    for i in (0, 3):
        for mod in (64, 1024):
            s = spark.sql(
                f"SELECT {position_sql('x', i, mod, 'spark')} AS p "
                "FROM (SELECT 'needle' AS x)"
            ).first().p
            d = duckdb.sql(
                f"SELECT {position_sql('x', i, mod, 'duckdb')} AS p "
                "FROM (SELECT 'needle' AS x)"
            ).fetchone()[0]
            assert s == d


def test_cms_estimate_bounds_and_duckdb_parity(spark, tokens):
    depth, width = 3, 16  # small width → real collisions
    sketch = cms_build(tokens, "tok", depth=depth, width=width)
    items = spark.createDataFrame([(w,) for w in WORDS], "tok: string")
    est = {
        r.tok: r.cms_est
        for r in cms_estimate(sketch, items, "tok", depth=depth, width=width).collect()
    }
    exact = {w: (i + 1) ** 2 for i, w in enumerate(WORDS)}
    total = sum(exact.values())
    for w in WORDS:
        assert est[w] >= exact[w]  # CMS never undercounts
        assert est[w] <= total

    # DuckDB replays the sketch bit-for-bit, collisions included
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE toks AS SELECT unnest(?) AS tok",
        [[w for i, w in enumerate(WORDS) for _ in range((i + 1) ** 2)]],
    )
    pos_union = " UNION ALL ".join(
        f"SELECT {i} AS d, {position_sql('tok', i, width, 'duckdb')} AS b FROM toks"
        for i in range(depth)
    )
    con.execute(f"CREATE TABLE cms AS SELECT d, b, COUNT(*) AS cnt FROM ({pos_union}) GROUP BY 1, 2")
    expr = cms_estimate_sql("w.tok", "cms", depth=depth, width=width)
    oracle = dict(
        con.execute(
            f"SELECT tok, {expr} FROM (SELECT DISTINCT tok FROM toks) w"
        ).fetchall()
    )
    assert est == oracle


def test_cms_merge_equals_rebuild(spark, tokens):
    a = tokens.where(F.length("tok") <= 4)
    b = tokens.where(F.length("tok") > 4)
    merged = cms_merge(
        cms_build(a, "tok", depth=2, width=32), cms_build(b, "tok", depth=2, width=32)
    )
    whole = cms_build(tokens, "tok", depth=2, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bloom_no_false_negatives_and_flags(spark):
    members = spark.createDataFrame([(w,) for w in WORDS[:4]], "k: string")
    bits = bloom_build(members, "k", num_bits=64, k=3)
    probe = spark.createDataFrame(
        [(w,) for w in WORDS] + [("missing-%d" % i,) for i in range(20)], "k: string"
    )
    flags = {r.k: r.bloom_member for r in bloom_member(probe, "k", bits, 64, k=3).collect()}
    for w in WORDS[:4]:
        assert flags[w] is True  # members always flagged
    # with 64 bits / 4 members most non-members clear the filter
    assert sum(1 for v in flags.values() if not v) > 0


def test_bloom_member_plan_is_broadcast_only(spark):
    members = spark.createDataFrame([("a",), ("b",)], "k: string")
    bits = bloom_build(members, "k", num_bits=128, k=4)
    probe = spark.range(100).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    plan = bloom_member(probe, "k", bits, 128, k=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the probe side must not shuffle: no Exchange hashpartitioning on it
    assert "SortMergeJoin" not in plan


def test_cms_join_size_bounds(spark):
    """Inner-product estimate >= exact join size; tight when width
    dwarfs the key space."""
    from pyspark.sql import functions as F

    from lightlane_spark.operators.sketches import cms_build, cms_join_size

    a = spark.range(200).select((F.col("id") % 50).cast("string").alias("k"))
    b = spark.range(300).select((F.col("id") % 50).cast("string").alias("k"))
    exact = a.join(b, "k").count()  # 50 keys x 4 x 6 = 1200
    assert exact == 1200
    est_wide = cms_join_size(
        cms_build(a, "k", 4, 4096), cms_build(b, "k", 4, 4096)
    ).first().est
    est_narrow = cms_join_size(
        cms_build(a, "k", 4, 16), cms_build(b, "k", 4, 16)
    ).first().est
    assert est_wide == 1200  # no collisions at width 4096
    assert est_narrow >= 1200  # collisions only ever overshoot
