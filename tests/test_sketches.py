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


# ---------------------------------------------------------------------------
# KMV bottom-k sketch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kmv_groups(spark):
    # two groups with a KNOWN overlap: g1 = items 0..399,
    # g2 = items 200..599 → |A|=|B|=400, |A∩B|=200, |A∪B|=600
    rows = [("g1", f"item{i}") for i in range(400)] + [
        ("g2", f"item{i}") for i in range(200, 600)
    ]
    # duplicates must not matter (sketch is over the distinct set)
    rows += rows[:50]
    return spark.createDataFrame(rows, "src: string, v: string")


def test_kmv_exact_below_k(spark):
    """A group with fewer than k distinct values estimates EXACTLY
    (the sketch is the whole set)."""
    from lightlane_spark.operators.sketches import kmv_estimate, kmv_sketch

    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(10)] * 3, "src: string, v: string"
    )
    sk = kmv_sketch(df, "v", "src", k=128)
    est = kmv_estimate(sk, "src", k=128).first()
    assert est.n_sk == 10
    assert est.est_n == 10.0


def test_kmv_estimate_accuracy_and_set_ops(spark, kmv_groups):
    """k=128 on n=400/600 → rel-err ~1/√k; assert within 3/√k, and
    the pair estimates track the planted overlap."""
    from lightlane_spark.operators.sketches import (
        kmv_estimate,
        kmv_pair_estimates,
        kmv_sketch,
    )

    sk = kmv_sketch(kmv_groups, "v", "src", k=128)
    ests = {r.src: r.est_n for r in kmv_estimate(sk, "src", k=128).collect()}
    tol = 3 / (128 ** 0.5)  # 3σ-ish: ~26%
    for g in ("g1", "g2"):
        assert abs(ests[g] - 400) / 400 < tol, (g, ests[g])
    pair = kmv_pair_estimates(sk, "src", k=128).first()
    assert pair.src_a == "g1" and pair.src_b == "g2"
    assert abs(pair.est_union - 600) / 600 < tol, pair.est_union
    # true Jaccard = 200/600 = 1/3; ρ has k-granularity — allow wider
    assert abs(pair.jaccard_est - 1 / 3) < 0.15, pair.jaccard_est
    assert abs(pair.est_intersect - 200) / 200 < 0.5, pair.est_intersect


def test_kmv_sketch_two_stage_matches_single_window(spark, kmv_groups):
    """The two-stage bottom-k (scale path) is EXACT: identical rows to
    a direct one-window bottom-k."""
    from pyspark.sql import Window

    from lightlane_spark.operators.sketches import kmv_hash, kmv_sketch

    sk = kmv_sketch(kmv_groups, "v", "src", k=64, stage1_buckets=4)
    got = sorted((r.src, r.h, r.rank) for r in sk.collect())
    dh = kmv_groups.select("src", kmv_hash("v").alias("h")).distinct()
    w = Window.partitionBy("src").orderBy("h")
    ref = (
        dh.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 64)
        .collect()
    )
    assert got == sorted((r.src, r.h, r.rank) for r in ref)


def test_kmv_hash_duckdb_parity(spark):
    """kmv_hash is bit-identical to the documented DuckDB twin."""
    from lightlane_spark.operators.sketches import kmv_hash

    vals = ["alpha", "beta", "item42", ""]
    got = {
        r.v: r.h
        for r in spark.createDataFrame([(v,) for v in vals], "v: string")
        .select("v", kmv_hash("v").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        (dh,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [v]
        ).fetchone()
        assert got[v] == dh, v


def test_kmv_merge_equals_rebuild(spark, kmv_groups):
    """Batch sketches merged with kmv_merge must equal the sketch of
    the concatenated input — the theta-union mergeability contract
    (same shape as test_cms_merge_equals_rebuild)."""
    from lightlane_spark.operators.sketches import kmv_merge, kmv_sketch

    half1 = kmv_groups.filter(F.col("v") < "item3")
    half2 = kmv_groups.filter(F.col("v") >= "item3")
    merged = kmv_merge(
        kmv_sketch(half1, "v", "src", k=64),
        kmv_sketch(half2, "v", "src", k=64),
        group_col="src",
        k=64,
    )
    rebuilt = kmv_sketch(kmv_groups, "v", "src", k=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_kmv_pair_jaccard_exact_regime(spark):
    """ADVICE r7: two IDENTICAL groups whose union has fewer than k
    distinct hashes must report jaccard_est exactly 1.0 and
    est_intersect equal to the true intersection — the ρ denominator
    is min(k, |union sketch|), not k (dividing by k biased the exact
    regime low: 50/128 for identical 50-value groups)."""
    from lightlane_spark.operators.sketches import (
        kmv_pair_estimates,
        kmv_sketch,
    )

    rows = [(g, f"val{i}") for g in ("a", "b") for i in range(50)]
    df = spark.createDataFrame(rows, "src: string, v: string")
    sk = kmv_sketch(df, "v", "src", k=128)
    p = kmv_pair_estimates(sk, "src", k=128).first()
    assert p.jaccard_est == 1.0, p
    assert p.est_intersect == 50.0, p
    assert p.est_union == 50.0, p

    # disjoint exact-regime pair: jaccard must be exactly 0
    rows2 = [("a", f"L{i}") for i in range(30)] + [
        ("b", f"R{i}") for i in range(30)
    ]
    df2 = spark.createDataFrame(rows2, "src: string, v: string")
    p2 = kmv_pair_estimates(
        kmv_sketch(df2, "v", "src", k=128), "src", k=128
    ).first()
    assert p2.jaccard_est == 0.0 and p2.est_intersect == 0.0, p2
    assert p2.est_union == 60.0, p2
