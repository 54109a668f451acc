"""Scale smoke (gated: SPARK_GRAFT_SCALE_SMOKE=1): the fuzzy-dedup
chain on an amplified corpus — ~125k docs built by replicating sf0.1
documents x25 with per-copy mutations. Verifies the pipeline's
super-linear terms stay bounded (bucket caps hold) and end-to-end
wall time stays in linear-ish territory on local[32].

Not part of the default suite (driver runs tests at sf0.001); run
manually, results recorded in SCALE.md.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="scale smoke is opt-in (SPARK_GRAFT_SCALE_SMOKE=1)",
)


def test_minhash_cc_at_125k_docs(spark):
    from lightlane_spark.operators.clustering import connected_components
    from lightlane_spark.operators.fuzzy_dedup import dedup_minhash

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(25).withColumnRenamed("id", "copy")
    # copy 0 keeps the text verbatim (a true duplicate of the base);
    # other copies get a distinct leading token (near-dup family)
    corpus = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * 100 + F.col("copy")).alias("doc_id"),
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(F.concat(F.concat_ws("", F.lit("tok"), F.col("copy")), F.lit(" "), F.col("text")))
            .alias("text"),
        )
    )
    n = corpus.count()
    assert n == 125_000
    t0 = time.monotonic()
    pairs = dedup_minhash(corpus, threshold=0.7).select("id_a", "id_b")
    cc = connected_components(pairs)
    n_nodes, n_comps = cc.agg(
        F.count("*").alias("n"), F.countDistinct("component").alias("c")
    ).first()
    wall = time.monotonic() - t0
    # every base doc spawns a 25-member near-dup family -> huge pair
    # count; clusters must form and the run must stay minutes-scale
    assert n_nodes > 50_000
    assert n_comps < n_nodes / 5
    assert wall < 600, f"scale smoke too slow: {wall:.0f}s"
    print(f"SCALE_SMOKE docs={n} paired_nodes={n_nodes} components={n_comps} wall={wall:.1f}s")


def test_ann_lsh_at_100k_vectors(spark):
    import pyspark.sql.functions as F

    from lightlane_spark.operators.similarity import ann_topk_lsh

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = spark.range(50).withColumnRenamed("id", "copy")
    corpus = emb.crossJoin(copies).select(
        (F.col("vec_id") * 100 + F.col("copy")).alias("vec_id"), "embedding"
    )
    n = corpus.count()
    assert n == 100_000
    probes = corpus.filter(F.col("vec_id") < 1000)
    t0 = time.monotonic()
    out = ann_topk_lsh(corpus, probes, dims=64, k=5, num_bits=8)
    n_results = out.count()
    wall = time.monotonic() - t0
    assert n_results > 0
    assert wall < 300, f"ANN smoke too slow: {wall:.0f}s"
    print(f"ANN_SMOKE corpus={n} probes=10 results={n_results} wall={wall:.1f}s")


def test_pq_at_100k_vectors(spark):
    import pyspark.sql.functions as F

    from lightlane_spark.operators.pq import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = spark.range(50).withColumnRenamed("id", "copy")
    corpus = emb.crossJoin(copies).select(
        (F.col("vec_id") * 100 + F.col("copy")).alias("vec_id"), "embedding"
    )
    probes = corpus.filter(F.col("vec_id") < 1000)
    t0 = time.monotonic()
    out = pq_topk(corpus, probes, k=5)
    rows = out.collect()
    wall = time.monotonic() - t0
    assert len(rows) == 500 * 5
    # every probe has 49 identical copies in the corpus: its top hit
    # must be an exact (sim ~ 1.0) match
    top = [r for r in rows if r.rank == 1]
    assert all(r.sim > 0.999 for r in top)
    assert wall < 300, f"PQ smoke too slow: {wall:.0f}s"
    print(f"PQ_SMOKE corpus=100000 probes=500 results={len(rows)} wall={wall:.1f}s")


def test_sketch_and_lm_at_125k_docs(spark):
    """The round-4 curation additions at 25× corpus: CMS heavy
    hitters, Bloom prefilter, bigram-LM scoring, corpus fingerprints.
    All are one-or-two-linear-shuffle shapes — wall time must stay
    well inside linear territory."""
    from lightlane_spark.operators.fuzzy_dedup import corpus_overlap_estimates
    from lightlane_spark.operators.sketches import (
        bloom_build,
        bloom_member,
        cms_build,
        cms_estimate,
    )
    from lightlane_spark.operators.text import lm_doc_scores

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text", F.col("source")
    )
    copies = spark.range(25).withColumnRenamed("id", "copy")
    corpus = docs.crossJoin(copies).select(
        (F.col("doc_id") * 100 + F.col("copy")).alias("doc_id"),
        F.concat(F.lit("tok"), F.col("copy"), F.lit(" "), F.col("text")).alias("text"),
        "source",
    )
    assert corpus.count() == 125_000

    t0 = time.monotonic()
    toks = corpus.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    sketch = cms_build(toks, "tok", depth=4, width=256)
    est = cms_estimate(sketch, toks.distinct(), "tok", depth=4, width=256)
    n_est = est.count()
    t_cms = time.monotonic() - t0
    assert n_est > 25  # base vocab + 25 copy markers

    t0 = time.monotonic()
    blocked = corpus.where(F.col("source") == "src0").select(F.md5("text").alias("fp"))
    bits = bloom_build(blocked, "fp", num_bits=1 << 17, k=5)
    flagged = bloom_member(
        corpus.select(F.md5("text").alias("fp")), "fp", bits, 1 << 17, k=5
    )
    n_flagged = flagged.where("bloom_member").count()
    t_bloom = time.monotonic() - t0
    assert n_flagged >= 6_250  # all true members flagged (src0 = 1/20)

    t0 = time.monotonic()
    n_scored = lm_doc_scores(corpus).count()
    t_lm = time.monotonic() - t0
    assert n_scored == 125_000

    t0 = time.monotonic()
    n_pairs = corpus_overlap_estimates(corpus, group_col="source").count()
    t_ov = time.monotonic() - t0
    assert n_pairs == 190  # C(20,2)

    total = t_cms + t_bloom + t_lm + t_ov
    assert total < 300, f"sketch/lm smoke too slow: {total:.0f}s"
    print(
        f"SCALE_SMOKE_SKETCH cms={t_cms:.1f}s bloom={t_bloom:.1f}s "
        f"lm={t_lm:.1f}s overlap={t_ov:.1f}s total={total:.1f}s"
    )


def test_prefix_filter_join_at_125k_docs(spark):
    """Exact prefix-filtered Jaccard join on the amplified corpus:
    5,000 base docs × 25-member near-dup families. At τ=0.8 every
    family is a within-family clique for its shifted variants, so the
    TRUE result is ~hundreds of thousands of pairs — the point is
    that candidate generation stays family-local (prefix grams are
    the family-specific rare grams), never corpus-quadratic, and the
    exact join completes in minutes-scale on local[32]."""
    from lightlane_spark.operators.fuzzy_dedup import prefix_filter_jaccard_join

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(25).withColumnRenamed("id", "copy")
    corpus = docs.crossJoin(copies).select(
        (F.col("doc_id") * 100 + F.col("copy")).alias("doc_id"),
        F.when(F.col("copy") == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.concat_ws("", F.lit("tok"), F.col("copy")),
                F.lit(" "),
                F.col("text"),
            )
        )
        .alias("text"),
    )
    t0 = time.monotonic()
    pairs = prefix_filter_jaccard_join(corpus, threshold=0.8)
    n_pairs = pairs.count()
    wall = time.monotonic() - t0
    # family cliques dominate; corpus-quadratic would be ~7.8e9 pairs
    assert n_pairs > 100_000
    assert wall < 600, f"prefix-filter smoke too slow: {wall:.0f}s"
    print(f"SCALE_SMOKE prefix_join docs=125000 pairs={n_pairs} wall={wall:.1f}s")


def test_bpe_train_at_125k_docs(spark):
    """BPE trainer on the amplified 125k-doc corpus, 3 rounds: the
    vocab-collapse claim under load — per-round work is bounded by
    |vocab| (amplification multiplies corpus rows 25x but barely
    grows the vocabulary, so rounds cost near the same as sf0.1)."""
    from lightlane_spark.operators.text import bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(25).withColumnRenamed("id", "copy")
    corpus = docs.crossJoin(copies).select(
        (F.col("doc_id") * 100 + F.col("copy")).alias("doc_id"),
        F.concat(F.concat_ws("", F.lit("tok"), F.col("copy")), F.lit(" "), F.col("text")).alias("text"),
    )
    t0 = time.monotonic()
    merges = bpe_train(corpus, n_rounds=3).collect()
    wall = time.monotonic() - t0
    assert len(merges) == 3
    # 25x the corpus must not mean 25x the trainer time: vocab-bound
    assert wall < 240, f"bpe scale smoke too slow: {wall:.0f}s"
    print(f"SCALE_SMOKE bpe_train rounds=3 merges={merges} wall={wall:.1f}s")


def test_containment_join_at_50k_docs(spark):
    """Asymmetric containment join on a x10-amplified corpus: copy 0
    is verbatim, other copies prepend one token — so every mutated
    copy CONTAINS its base doc's full gram set AND (long docs) family
    copies contain each other's tails, i.e. the true result is the
    family ORDERED-pair cliques (~x2 a Jaccard clique). The full-side
    index explodes every gram (vs the Jaccard smoke's prefix-only
    index) which multiplies candidate rows by the family size — x10
    keeps the smoke minutes-scale on local[32]; the design point being
    smoked is that candidates travel as bare id triples and arrays
    join back once per verified pair, so shuffle bytes stay linear in
    gram rows, never O(n²) per-doc array duplication."""
    from lightlane_spark.operators.fuzzy_dedup import containment_join

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(10).withColumnRenamed("id", "copy")
    corpus = docs.crossJoin(copies).select(
        (F.col("doc_id") * 100 + F.col("copy")).alias("doc_id"),
        F.when(F.col("copy") == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.concat_ws("", F.lit("tok"), F.col("copy")),
                F.lit(" "),
                F.col("text"),
            )
        )
        .alias("text"),
    )
    t0 = time.monotonic()
    n_pairs = containment_join(corpus, threshold=0.9).count()
    wall = time.monotonic() - t0
    # every family yields >= its 9 (base contained-in copy) pairs
    assert n_pairs > 40_000
    assert wall < 600, f"containment smoke too slow: {wall:.0f}s"
    print(f"SCALE_SMOKE containment docs=50000 pairs={n_pairs} wall={wall:.1f}s")


def test_kcore_window_peel_at_1m_edges(spark):
    """Window-based k-core peel on a synthetic ~1M-edge graph
    (power-law-ish: vertex v links to v/2 .. v/2+v%8): four rounds of
    two window exchanges each over 2|E| long rows — the r7 join-free
    form — must stay seconds-scale and return a non-trivial core."""
    from lightlane_spark.operators.clustering import kcore_peel

    edges = (
        spark.range(1, 500_001)
        .select(F.col("id").alias("v"))
        .select(
            "v",
            F.explode(
                F.sequence(
                    F.floor(F.col("v") / 2).cast("long"),
                    F.floor(F.col("v") / 2).cast("long") + F.col("v") % 8,
                )
            ).alias("u"),
        )
        .where(F.col("u") < F.col("v"))
        .select(F.col("u").cast("long").alias("id_a"), F.col("v").alias("id_b"))
    )
    t0 = time.monotonic()
    core = kcore_peel(edges, k=4, rounds=4)
    n_core = core.count()
    wall = time.monotonic() - t0
    assert n_core > 0
    assert wall < 300, f"kcore scale smoke too slow: {wall:.0f}s"
    print(f"SCALE_SMOKE kcore_peel edges~1M core={n_core} wall={wall:.1f}s")


def test_kmv_at_10m_values(spark):
    """KMV bottom-k at 10M multiset rows / 8 groups with planted
    overlap structure: group g holds values [g*500k, g*500k + 1.25M)
    — each adjacent pair overlaps 750k (true J ≈ 0.43). The sketch
    build must stay linear (one shuffle of the multiset, per-bucket
    bounded sorts) and the estimates must land within 3/√k of
    truth."""
    from lightlane_spark.operators.sketches import (
        kmv_estimate,
        kmv_pair_estimates,
        kmv_sketch,
    )

    k = 256
    base = spark.range(0, 10_000_000, numPartitions=32)
    # 8 groups × 1.25M rows; group g covers the dense integer range
    # [g·500k, g·500k + 1.25M) — adjacent pairs share 750k values
    # (true J = 750k/1.75M ≈ 0.43), distance-2 pairs share 250k
    df = base.select(
        F.concat(F.lit("g"), (F.col("id") % 8).cast("string")).alias("src"),
        (
            (F.col("id") % 8) * 500_000
            + F.floor(F.col("id") / 8) % 1_500_000
        ).cast("string").alias("v"),
    )
    t0 = time.time()
    sk = kmv_sketch(df, "v", "src", k=k)
    ests = {r.src: r.est_n for r in kmv_estimate(sk, "src", k=k).collect()}
    pairs = kmv_pair_estimates(sk, "src", k=k).collect()
    dt = time.time() - t0
    tol = 3 / (k ** 0.5)
    # assert against the exact per-group distinct count computed once
    exact = {
        r.src: r.n
        for r in df.groupBy("src")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    for g, e in ests.items():
        assert abs(e - exact[g]) / exact[g] < tol, (g, e, exact[g])
    adjacent = [p for p in pairs if
                int(p.src_b[1:]) - int(p.src_a[1:]) == 1]
    assert adjacent and all(p.jaccard_est > 0.2 for p in adjacent), [
        (p.src_a, p.src_b, p.jaccard_est) for p in adjacent
    ]
    print(f"kmv 10M rows/8 groups k={k}: {dt:.1f}s")


def test_skewed_graph_at_1m_edges(spark):
    """VERDICT r7 ask #4 — the graph chain's skew story. Synthetic
    ~1M-edge graph with a power-law degree profile plus ONE true
    super-node:

      - star: edges (0, v) for v in 1..500k — hub degree 500,000;
      - heavy tail: edges (floor(sqrt(v)), v) — node m receives
        ~2m+1 edges, so a few hundred nodes carry thousands of edges
        each (power-law-ish middle);
      - planted 40-clique on nodes 1..40 (780 edges) so the k=4 core
        is provably non-empty.

    What skew stresses where:

      * ``connected_components`` (forced distributed path): the
        stars run in the WINDOW-MIN form this test motivated — the
        original collect_set → explode form was O(degree²) on hot
        nodes (the per-row re-point expression re-scanned the
        neighbor array per exploded row; this test measured it at
        1169 s before the r8 rewrite, 10.6 s after) and buffered the
        hub's whole neighbor set in one aggregation buffer. The
        window form streams each hub partition once, bounded memory.
      * ``kcore_peel``: both per-round windows hash-partition by
        vertex/edge key — the hub's 500k long-format rows land in one
        window partition, processed as a single sorted stream
        (bounded memory, serial in hub degree). AQE does NOT split
        skewed window partitions (skew-join splitting applies to
        joins only) — that boundary is the documented contract.

    Correctness anchors: the star makes the whole graph ONE component
    with min-id 0; the 40-clique must survive a k=4 peel, and the hub
    survives WITH it (every clique member keeps its star edge, so the
    hub retains >= 40 neighbors after the low-degree tail peels away —
    its reported degree is the PEELED-graph degree, not 500k).
    """
    from lightlane_spark.operators.clustering import (
        connected_components,
        kcore_peel,
    )

    v = spark.range(1, 500_001).select(F.col("id").alias("v"))
    star = v.select(F.lit(0).cast("long").alias("id_a"), F.col("v").alias("id_b"))
    sqrt_edges = (
        v.select(
            F.floor(F.sqrt(F.col("v"))).cast("long").alias("id_a"),
            F.col("v").alias("id_b"),
        )
        .where(F.col("id_a") < F.col("id_b"))
    )
    cl = spark.range(1, 41).select(F.col("id").alias("a"))
    clique = (
        cl.crossJoin(cl.select(F.col("a").alias("b")))
        .where(F.col("a") < F.col("b"))
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    )
    edges = star.unionByName(sqrt_edges).unionByName(clique)
    n_edges = edges.count()
    assert 990_000 < n_edges < 1_010_000, n_edges

    t0 = time.monotonic()
    cc = connected_components(edges, driver_edge_cap=None)
    n_nodes, n_comps, min_comp = cc.agg(
        F.count("*").alias("n"),
        F.countDistinct("component").alias("c"),
        F.min("component").alias("m"),
    ).first()
    cc_wall = time.monotonic() - t0
    assert n_nodes == 500_001, n_nodes
    assert n_comps == 1 and min_comp == 0, (n_comps, min_comp)
    assert cc_wall < 600, f"skewed CC too slow: {cc_wall:.0f}s"

    t0 = time.monotonic()
    core = kcore_peel(edges, k=4, rounds=4)
    core_rows = core.count()
    hub = core.where(F.col("id") == 0).first()
    clique_survivors = core.where(
        (F.col("id") >= 1) & (F.col("id") <= 40)
    ).count()
    kc_wall = time.monotonic() - t0
    assert clique_survivors == 40, clique_survivors
    assert hub is not None and hub.deg >= 40, hub
    assert kc_wall < 600, f"skewed kcore too slow: {kc_wall:.0f}s"
    print(
        f"SCALE_SMOKE skewed_graph edges={n_edges} hub_deg=500k "
        f"cc_wall={cc_wall:.1f}s core_rows={core_rows} "
        f"kcore_wall={kc_wall:.1f}s"
    )


def test_skewed_corpus_at_125k_docs(spark):
    """Hot-GROUP and hot-DOC skew for the text/sketch families (the
    companion to the graph-side skew smoke): 125k docs where

      - one source ('hot') holds 50% of the corpus (the other half
        spreads over the original ~20 sources) — every groupBy/window
        keyed by source gets one partition with half the data;
      - one MEGA-DOC carries ~500x the median token count — the
        in-row explode paths (shingles, tokens) emit its rows from a
        single input row, and per-doc aggregations get one hot key.

    What each operator must prove:

      * ``kmv_sketch`` per source: the two-stage bottom-k splits the
        hot group's distinct hashes over ``stage1_buckets`` window
        partitions, so no single sort sees the whole hot group; the
        estimate must still land within 3/sqrt(k) of the hot group's
        true distinct count (estimator correctness under skew).
      * ``temperature_mix_sample``: quota computation is per-group
        aggregate-sized regardless of group skew; the tau<1 mix must
        allocate the hot source LESS than its natural 50% share.
      * ``cms_build`` heavy hitters: Zipf-skewed token keys ride
        map-side partial aggregation — shuffle rows stay bounded by
        depth x width per partition, never corpus-sized.
      * mega-doc tokenization: token/shingle explode is linear in doc
        length (the r8 graph smoke caught a quadratic in exactly this
        shape — per-exploded-row re-evaluation of an array aggregate).
    """
    from lightlane_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )
    from lightlane_spark.operators.text import temperature_mix_sample

    docs = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    ).select("doc_id", "text", "source")
    copies = spark.range(25).withColumnRenamed("id", "copy")
    corpus = docs.crossJoin(copies).select(
        (F.col("doc_id") * 100 + F.col("copy")).alias("doc_id"),
        F.concat(F.lit("tok"), F.col("copy"), F.lit(" "), F.col("text")).alias(
            "text"
        ),
        # 50% of rows land in ONE group
        F.when((F.col("doc_id") + F.col("copy")) % 2 == 0, F.lit("hot"))
        .otherwise(F.col("source"))
        .alias("source"),
    )
    # one mega-doc: ~500x the median length, all distinct tokens
    mega = spark.range(1).select(
        F.lit(9_999_999).alias("doc_id"),
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(50_000)),
                lambda i: F.concat(F.lit("mw"), i.cast("string")),
            ),
            F.lit(""),
            lambda acc, x: F.concat(acc, F.lit(" "), x),
        ).alias("text"),
        F.lit("hot").alias("source"),
    )
    corpus = corpus.unionByName(mega)
    n = corpus.count()
    assert n == 125_001

    # 1. KMV per source under 50% group skew
    t0 = time.monotonic()
    toks = corpus.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    sk = kmv_sketch(toks, "w", "source", k=256)
    ests = {r.src if hasattr(r, "src") else r.source: r.est_n
            for r in kmv_estimate(sk, "source", k=256).collect()}
    t_kmv = time.monotonic() - t0
    exact_hot = (
        toks.where(F.col("source") == "hot")
        .select("w").distinct().count()
    )
    est_hot = ests["hot"]
    assert abs(est_hot - exact_hot) / exact_hot < 3 / (256 ** 0.5), (
        est_hot, exact_hot
    )

    # 2. temperature mix: hot source must be DOWN-weighted vs its 50%
    t0 = time.monotonic()
    mix = temperature_mix_sample(
        corpus.select("doc_id", "source"), "source", budget=2000,
        temperature=0.5,
    )
    hot_share = (
        mix.where(F.col("source") == "hot").count() / max(mix.count(), 1)
    )
    t_mix = time.monotonic() - t0
    assert hot_share < 0.35, hot_share  # sqrt damping: ~0.17 expected

    # 3. mega-doc token stats stay linear (one row -> 50k exploded)
    t0 = time.monotonic()
    mega_tok = (
        corpus.where(F.col("doc_id") == 9_999_999)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .count()
    )
    t_mega = time.monotonic() - t0
    assert mega_tok == 50_000, mega_tok

    # 4. CMS under Zipf-skewed token keys: the sketch relation is
    # bounded by depth x width regardless of the hot tokens' counts
    # (map-side partial aggregation carries the skew)
    from lightlane_spark.operators.sketches import cms_build

    t0 = time.monotonic()
    sketch_rows = cms_build(
        toks.select(F.col("w").alias("tok")), "tok", depth=4, width=256
    ).count()
    t_cms = time.monotonic() - t0
    assert sketch_rows <= 4 * 256, sketch_rows

    total = t_kmv + t_mix + t_mega + t_cms
    assert total < 300, f"skewed corpus smoke too slow: {total:.0f}s"
    print(
        f"SCALE_SMOKE skewed_corpus docs={n} hot_share_docs=0.5 "
        f"kmv={t_kmv:.1f}s (est_hot={est_hot:.0f} vs {exact_hot}) "
        f"mix={t_mix:.1f}s (hot_share={hot_share:.3f}) mega={t_mega:.1f}s "
        f"cms={t_cms:.1f}s ({sketch_rows} sketch rows)"
    )


def test_bm25_hot_token_at_6m_docs(spark):
    """Hot-TOKEN skew for the retrieval family: 6M docs that ALL
    contain one query term ('hot') while 1/1000 contain a
    discriminative term ('rare') — the stop-word-in-the-query shape.

    What the operator must prove: document frequency comes from a
    map-side-combined groupBy + broadcast join, NOT from
    count().over(Window.partitionBy(tok)) — the window form shuffles
    the hot term's ENTIRE postings list (6M (doc, term) rows here,
    1e8+ at corpus scale) into ONE task's sort buffer. Measured at
    30M hot rows on local[32]: window 19-45 s vs groupBy+join 9-11 s
    steady-state, and the gap is the single-task wall, so it widens
    with scale; at 3M rows the window is still FASTER (one in-RAM
    sort beats re-tokenizing) — the fix targets the 100 TB shape,
    not the small one.

    Correctness ride-along: every 'rare' doc shares tf/dl, so the
    top-10 must be exactly the first ten rare doc ids (idf of a
    term in every doc ~ 0; ties break on doc id).
    """
    from lightlane_spark.operators.text import bm25_topk

    n = 6_000_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("hot filler"),
            (F.col("id") % 7).cast("string"),
            F.when(F.col("id") % 1000 == 0, F.lit(" rare")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    t0 = time.monotonic()
    top = bm25_topk(docs, ["hot", "rare"], k=10).collect()
    dt = time.monotonic() - t0
    assert [r.doc_id for r in top] == [i * 1000 for i in range(10)], top
    # single-partition window on the hot term would blow far past
    # this on spill; the groupBy+join form rides partial aggregation
    assert dt < 120, f"bm25 hot-token smoke too slow: {dt:.0f}s"
    print(f"SCALE_SMOKE bm25_hot_token docs={n} hot_postings={n} dt={dt:.1f}s")
