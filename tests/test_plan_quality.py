"""Plan-quality contracts: the physical plans the operators must keep
(the 100 TB guarantees — a regression here is a scale bug even when
results stay correct)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightlane_spark.loaders.loader import merge_upsert
from lightlane_spark.operators.fuzzy_dedup import dedup_minhash
from lightlane_spark.plans.explain import plan_summary
from lightlane_spark.sources.parquet import read_table


def test_merge_broadcasts_small_staging(spark, sf_dir):
    """An incremental MERGE batch must anti-join by broadcasting the
    small staging side — never shuffling the (huge) target."""
    target = read_table(spark, sf_dir, "orders")
    staging = target.filter("o_orderkey % 50 = 0")
    merged = merge_upsert(target, staging, ["o_orderkey"], broadcast_staging=True)
    ps = plan_summary(merged)
    assert "BroadcastHashJoin" in ps.text and "LeftAnti" in ps.text
    assert ps.sortmerge_joins == 0


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """Group-agg must map-side combine: two HashAggregate levels with
    exactly one data Exchange between them."""
    import __spark_entry__ as m

    df = m.q_pricing_summary(spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("HashAggregate") >= 2
    # one shuffle for the agg + one for the final orderBy
    assert ps.exchanges <= 2, ps.text[:800]


def test_minhash_pipeline_no_cartesian(spark, sf_dir):
    """LSH candidates must come from bucket-local expansion — any
    CartesianProduct/BroadcastNestedLoop in the plan means the O(n²)
    guard failed."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = dedup_minhash(docs)
    ps = plan_summary(out)
    assert "CartesianProduct" not in ps.text
    assert "BroadcastNestedLoopJoin" not in ps.text


def test_filter_pushdown_survives_pipeline(spark, sf_dir):
    """A filter declared after projection still reaches the scan."""
    df = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_quantity")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey")
    )
    ps = plan_summary(df)
    assert any("l_quantity" in f for f in ps.pushed_filters)
    assert ps.scan_reads_only({"l_orderkey", "l_quantity"}), ps.read_schemas


def test_small_order_revenue_broadcasts_part(spark, sf_dir):
    """The dim-sized part table must broadcast; the correlated-avg
    subquery re-join shuffles on l_partkey only."""
    from lightlane_spark.queries_relational import q_small_order_revenue

    ps = plan_summary(q_small_order_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in ps.text
    assert "CartesianProduct" not in ps.text


def test_having_filter_scalar_is_broadcast_not_cartesian(spark, sf_dir):
    """HAVING vs a 1-row scalar aggregate must be a broadcast
    nested-loop against ONE row — no shuffle of the per-part aggs
    beyond their own groupBy, and never a real cartesian blowup."""
    from lightlane_spark.queries_relational import q_having_filter

    ps = plan_summary(q_having_filter(spark, sf_dir))
    assert "CartesianProduct" not in ps.text


def test_window_range_frame_single_shuffle(spark, sf_dir):
    """RANGE-frame window = one Exchange keyed by user_id, one Window
    node — no self-join shape."""
    from lightlane_spark.queries_relational import q_window_range_frame

    ps = plan_summary(q_window_range_frame(spark, sf_dir))
    assert ps.text.count("Window") >= 1
    assert ps.exchanges == 1, ps.text[:800]
    assert "Join" not in ps.text


def test_quantize_codes_map_only(spark, sf_dir):
    """Quantization must be a pure projection over the scan — zero
    Exchanges (the whole point: linear, shuffle-free at 100 TB)."""
    from lightlane_spark.operators.embeddings import quantize_codes

    emb = read_table(spark, sf_dir, "embeddings")
    ps = plan_summary(quantize_codes(emb))
    assert ps.exchanges == 0, ps.text[:800]


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    """A filter on the partition column must become PartitionFilters
    on the scan (directory pruning) — not a post-scan Filter over all
    partitions."""
    ev = read_table(spark, sf_dir, "events").limit(2000)
    path = str(tmp_path / "ev_part")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    ps = plan_summary(back)
    assert "PartitionFilters" in ps.text
    assert "event_type" in ps.text.split("PartitionFilters", 1)[1][:200]


def test_zorder_repartition_single_exchange(spark, sf_dir):
    """Z-order layout costs exactly one range-partitioning exchange —
    the same class as any global sort, nothing extra."""
    from lightlane_spark.operators.layout import zorder_repartition
    from lightlane_spark.sources.parquet import read_table

    ev = read_table(spark, sf_dir, "events")
    specs = [("user_id", 0, 1000000), ("event_id", 0, 10**9)]
    out = zorder_repartition(ev, specs, 8, bits=12)
    ps = plan_summary(out)
    assert ps.exchanges == 1, ps.text[:600]


def test_dedup_minhash_candidate_ids_no_extra_exchange(spark, sf_dir):
    """The verifier's candidate-id list derives from the cached bucket
    arrays: adding it to the plan must not add an exchange beyond the
    pair path itself (a pairs-derived distinct would)."""
    from lightlane_spark.operators.fuzzy_dedup import (
        _pairs_from_buckets,
        bucket_candidate_ids,
        jaccard_verify,
        lsh_band_keys,
        lsh_buckets,
        minhash_signature_arrays,
        shingle,
    )
    from lightlane_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = shingle(docs, distinct=False)
    buckets = lsh_buckets(lsh_band_keys(minhash_signature_arrays(sh)))
    cand = _pairs_from_buckets(buckets, 1000)
    ids = bucket_candidate_ids(buckets)
    with_ids = plan_summary(
        jaccard_verify(cand, sh, threshold=0.7, cand_ids=ids)
    ).exchanges
    fallback = plan_summary(jaccard_verify(cand, sh, threshold=0.7)).exchanges
    assert with_ids < fallback, (with_ids, fallback)


def test_pq_encode_map_only(spark, sf_dir):
    """PQ encode must be a pure Arrow projection over the scan — zero
    Exchanges (codes are written in one linear pass at any scale)."""
    from lightlane_spark.operators.pq import pq_encode, pq_fit

    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=16, k=16)
    ps = plan_summary(pq_encode(emb, books))
    assert ps.exchanges == 0, ps.text[:800]


def test_pq_topk_no_cartesian_and_broadcast_rerank(spark, sf_dir):
    """The ADC scan is map-only over codes; the only joins in the
    re-rank are broadcasts of the Q×shortlist candidate set — no
    CartesianProduct, no shuffle of the corpus."""
    from lightlane_spark.operators.pq import pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    out = pq_topk(emb, emb.filter("vec_id < 10"), k=5)
    ps = plan_summary(out)
    assert "CartesianProduct" not in ps.text
    assert ps.broadcast_joins >= 2, ps.text[:800]


def test_cms_estimate_broadcast_only_probe_side(spark, sf_dir):
    """CMS estimation must be broadcast joins on the probe side — a
    sort-merge join would shuffle the (at scale, corpus-sized) item
    relation against a kilobyte sketch."""
    from lightlane_spark.operators.sketches import cms_build, cms_estimate

    toks = read_table(spark, sf_dir, "documents").selectExpr(
        "explode(split(text, ' ')) AS tok"
    )
    est = cms_estimate(cms_build(toks, "tok", 3, 64), toks.distinct(), "tok", 3, 64)
    ps = plan_summary(est)
    assert ps.broadcast_joins == 3, ps.text[:800]
    assert ps.sortmerge_joins == 0


def test_pruned_scan_reads_file_subset_and_pushes_filter(spark, sf_dir, tmp_path):
    """The manifest must shrink the file list BEFORE the scan, and the
    residual predicate must still push into parquet."""
    import datetime as dt

    from lightlane_spark.loaders.dataskip import pruned_scan, write_with_stats

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    path = str(tmp_path / "li_skip")
    write_with_stats(li, path, ["l_shipdate"], num_files=8)
    out = pruned_scan(
        spark, path, "l_shipdate", dt.date(1995, 1, 1), dt.date(1995, 6, 30)
    )
    assert 0 < len(out.inputFiles()) < 8
    ps = plan_summary(out)
    assert any("l_shipdate" in f for f in ps.pushed_filters), ps.pushed_filters


def test_local_supplier_volume_broadcasts_all_dims(spark, sf_dir):
    """Q5: supplier/nation/region must broadcast; only the fact-fact
    orderkey join and the aggregation may shuffle."""
    from lightlane_spark.queries_relational import q_local_supplier_volume

    ps = plan_summary(q_local_supplier_volume(spark, sf_dir))
    assert ps.text.count("BroadcastHashJoin") >= 3, ps.text[:800]
    assert "CartesianProduct" not in ps.text


def test_dpp_scan_has_dynamic_partition_filter(spark, sf_dir):
    """The year-partitioned fact scan must carry a runtime
    dynamicpruning partition filter derived from the broadcast dim —
    a plain scan-all-partitions plan silently loses the 100 TB win."""
    import __spark_entry__ as m

    df = m._queries_unordered()["dpp_scan"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]


def test_prefix_filter_join_no_cartesian(spark, sf_dir):
    """Prefix filtering must candidate-generate through the gram
    equi-join — never a cross product."""
    from lightlane_spark.operators.fuzzy_dedup import prefix_filter_jaccard_join

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = prefix_filter_jaccard_join(docs, threshold=0.7)
    ps = plan_summary(out)
    assert "CartesianProduct" not in ps.text
    assert "BroadcastNestedLoopJoin" not in ps.text


def test_set_similarity_joinbacks_shuffle_hash(spark, sf_dir):
    """The two gram-array join-backs must plan as ShuffledHashJoin
    regardless of statistics (the r13 scale-ratio audit measured
    statistics-led broadcast of the array-laden docs relation at
    100s-of-MB per task before the persisted relation's true stats
    exist). Removing the shuffle_hash hints reverts the strategy to
    whatever Catalyst's undersized estimate picks — this pin is the
    regression guard for that fix."""
    from lightlane_spark.operators.fuzzy_dedup import (
        containment_join,
        prefix_filter_jaccard_join,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    for fn, kw in (
        (prefix_filter_jaccard_join, {"threshold": 0.7}),
        (containment_join, {"threshold": 0.9}),
    ):
        ps = plan_summary(fn(docs, **kw))
        assert ps.text.count("ShuffledHashJoin") >= 2, (
            fn.__name__,
            ps.text[:1200],
        )
        assert "CartesianProduct" not in ps.text, fn.__name__
        assert "BroadcastNestedLoopJoin" not in ps.text, fn.__name__


def test_global_running_sum_no_global_window(spark, sf_dir):
    """The two-phase running sum must not contain a single-partition
    window over the DATA relation: every unpartitioned Window in the
    plan must sit on the bucket-totals side (tiny), which shows up as
    a window whose input is an aggregate, not the raw scan. We assert
    the cheap invariant: at most one unpartitioned window, and at
    least one window partitioned by the bucket key."""
    from lightlane_spark.operators.temporal import global_running_sum

    ev = read_table(spark, sf_dir, "events").select("ts", F.lit(1).alias("v"))
    deltas = ev.groupBy("ts").agg(F.sum("v").alias("d"))
    out = global_running_sum(
        deltas, "ts", "d", F.date_trunc("day", F.col("ts"))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window .*", plan)
    unpartitioned = [w for w in windows if "partitionBy" not in w.replace(" ", "")]
    # Spark prints partition spec inside the Window operator line;
    # the bucket-partitioned window mentions __bk, the offsets window
    # doesn't. Both must exist, and no OTHER unpartitioned window may.
    assert any("__bk" in w for w in windows), windows
    assert len(windows) == 2, windows


def test_runtime_bloom_filter_join(spark, sf_dir):
    """Spark's runtime row-level Bloom filter: joining the fact table
    to a selectively-filtered build side should insert a
    bloom_filter_agg on the build side and a might-contain probe on
    the fact scan — rows that can't match die before the shuffle. The
    default thresholds target cluster scale (10 GB application-side
    scans), so this test lowers them to demonstrate/pin the
    mechanism; at 100 TB the defaults fire on their own."""
    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = read_table(spark, sf_dir, "lineitem")
        o = read_table(spark, sf_dir, "orders").filter("o_totalprice > 400000")
        j = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1200]
        # the join itself must still be a real equi-join
        assert "CartesianProduct" not in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_no_exchange_under_join(spark, sf_dir):
    """The bucketed sort-merge join must consume both tables' bucket
    layout directly: no ShuffleExchange may sit between either bucketed
    scan and the join. (The only exchange allowed in the whole plan is
    the final per-segment aggregation.) Losing this silently re-adds
    two full-table shuffles per join at 100 TB."""
    import __spark_entry__ as m

    df = m._queries_unordered()["bucketed_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_part = plan[plan.find("SortMergeJoin"):] if "SortMergeJoin" in plan else plan
    # everything BELOW the join (its inputs) must be exchange-free
    assert "SortMergeJoin" in plan, plan[:1500]
    assert "Exchange hashpartitioning" not in join_part, join_part[:1500]


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """AQE's OptimizeSkewedJoin must split a hot shuffle partition at
    runtime (join marked skew=true) — the zero-code answer to skewed
    fact keys at 100 TB, complementing the manual `salted_join` path
    (which remains for both-sides-hot joins AQE can't fix).

    Nuance pinned here because it bites in production: Spark SKIPS the
    skew split when a downstream operator reuses the join's hash
    partitioning (the split would re-add a shuffle, see
    spark.sql.adaptive.forceOptimizeSkewedJoin) — so the probe
    aggregates on a non-join key."""
    confs = {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 96), F.col("id").cast("string")).alias("pay"),
        )
        dim = spark.range(0, 400_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        j = (
            big.join(dim, "k")
            .select(F.length("pay").alias("L"))
            .agg(F.sum("L").alias("s"))
        )
        assert j.collect()[0][0] > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_frequent_pairs_plan_has_four_exchanges(spark, sf_dir):
    """frequent_pairs' brand dictionary is derived ONCE (persisted,
    read by all three use sites) — deriving it lazily embedded its
    distinct+window subtree at every site, which was 6 of the r4
    plan's 8 exchanges. Budget: dictionary distinct + its 25-row
    window + the basket groupBy + the (≤300-row) pair aggregation
    = 4; a 5th means a use site re-derived the dictionary."""
    from lightlane_spark.plans.explain import plan_summary
    import __spark_entry__ as m

    # pin the conf this count depends on: with broadcasts disabled
    # (e.g. leaked from a no-broadcast test elsewhere in the session)
    # the dim joins become SMJs and add exchanges that say nothing
    # about the dictionary-reuse property this test pins
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "10485760")
    spark.catalog.clearCache()
    try:
        df = m._queries_unordered()["frequent_pairs"](spark, sf_dir)
        ps = plan_summary(df)
    finally:
        spark.conf.set(key, old)
        spark.catalog.clearCache()
    assert ps.exchanges <= 4, ps.text[:1500]


def test_promotion_suppliers_shares_one_partkey_exchange(spark, sf_dir):
    """The per-(part,supplier) groupBy and the per-part window must
    share the single explicit repartition(l_partkey) — subset-key
    HashPartitioning satisfies both ClusteredDistributions. Plan
    budget: that shared exchange + the supplier distinct + the final
    sort = 3; a 4th means the window re-shuffled."""
    from lightlane_spark.plans.explain import plan_summary
    import __spark_entry__ as m

    df = m._queries_unordered()["promotion_suppliers"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.exchanges <= 3, ps.text[:1500]


def test_pareto_frontier_no_self_join(spark, sf_dir):
    """The skyline must come from per-size minima + a broadcast
    staircase — the textbook all-pairs dominance (cartesian or
    nested-loop self-join) must never appear in the plan."""
    from lightlane_spark.queries_relational import q_pareto_frontier

    ps = plan_summary(q_pareto_frontier(spark, sf_dir))
    assert "CartesianProduct" not in ps.text
    assert "BroadcastNestedLoopJoin" not in ps.text
    assert "BroadcastHashJoin" in ps.text


def test_point_in_time_join_is_equi_join(spark, sf_dir):
    """The SCD2 validity lookup must plan as an equi-join on the key
    (broadcast or sort-merge) with the interval as a post-join
    filter — a nested-loop range join here is the scale bug."""
    from lightlane_spark.queries_relational import q_point_in_time_join

    ps = plan_summary(q_point_in_time_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in ps.text
    assert "CartesianProduct" not in ps.text
    assert ("SortMergeJoin" in ps.text) or ("BroadcastHashJoin" in ps.text) or (
        "ShuffledHashJoin" in ps.text
    )


def test_quantile_normalize_caches_grid_sized_src(spark, sf_dir):
    """Both consumers (output rows + target means) must read the
    grid-sized cached src — without the persist the corpus-wide
    per-group sort runs twice."""
    from lightlane_spark.queries_relational import q_quantile_normalize

    ps = plan_summary(q_quantile_normalize(spark, sf_dir))
    assert ps.text.count("InMemoryTableScan") >= 2, ps.text[:800]
    from lightlane_spark.cache import unpersist_all

    unpersist_all(spark)


def test_seasonal_baseline_single_fact_shuffle(spark, sf_dir):
    """Baseline + recent-week stats must fold in ONE conditional
    groupBy: the 1-row max broadcasts, the fact exchanges once for
    the agg (plus the presentation orderBy)."""
    from lightlane_spark.queries_temporal import q_seasonal_baseline

    ps = plan_summary(q_seasonal_baseline(spark, sf_dir))
    assert "CartesianProduct" not in ps.text
    # exchanges: agg shuffle + final sort (+ the broadcast exchange
    # is not a data shuffle); allow one slack for AQE variants
    assert ps.exchanges <= 3, ps.text[:800]


def test_kmv_set_ops_corpus_scanned_once(spark, sf_dir):
    """kmv_set_ops touches the corpus exactly once (the sketch build);
    every pair-estimate join runs over ≤k·|groups| sketch rows. The
    plan must show ONE documents scan and no cartesian anywhere —
    the crossJoin over the 20-row estimate relation is broadcast."""
    import __spark_entry__ as m

    df = m.queries()["kmv_set_ops"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("documents.parquet") == 1, ps.text[:1200]
    assert "CartesianProduct" not in ps.text


def test_cusum_changepoint_single_corpus_shuffle(spark, sf_dir):
    """The only corpus-sized exchange is the (type, day) count; the
    windows and argmax run over the days×types relation. Thinning
    must stay a map-only Filter under the first aggregate."""
    import __spark_entry__ as m

    df = m.queries()["cusum_changepoint"](spark, sf_dir)
    ps = plan_summary(df)
    # corpus shuffle ×2 (daily agg feeds both the stats branch and the
    # cusum branch) + tiny joins/windows; no cartesian, no corpus sort
    assert "CartesianProduct" not in ps.text
    assert ps.text.count("events.parquet") <= 2, ps.text[:1200]


def test_embedding_centroids_one_moment_shuffle(spark, sf_dir):
    """Centroids = one map-side-combined (label, dim) moment shuffle
    over the posexplode fan-out + the presentation sort — and ONE
    embeddings scan."""
    import __spark_entry__ as m

    df = m.queries()["embedding_centroids"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("embeddings.parquet") == 1
    assert ps.exchanges <= 2, ps.text[:800]
    assert ps.text.count("HashAggregate") >= 2  # partial + final


def test_compression_ratio_map_only_until_sort(spark, sf_dir):
    """The zlib pass is Arrow-batched mapInPandas over the scan; the
    ONLY exchange is the presentation sort."""
    import __spark_entry__ as m

    df = m.queries()["compression_ratio"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.exchanges <= 1, ps.text[:800]
    assert "MapInPandas" in ps.text


def test_retrieval_metrics_single_corpus_postings_pass(spark, sf_dir):
    """bm25_multi must score ALL queries in one postings pass: the
    documents corpus appears at most twice (postings + doc-length
    stats), never once per query, and nothing goes cartesian."""
    import __spark_entry__ as m

    df = m.queries()["retrieval_metrics"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("documents.parquet") <= 2, ps.text[:1200]
    assert "CartesianProduct" not in ps.text


def test_kaplan_meier_two_corpus_scans(spark, sf_dir):
    """The KM chain must scan events exactly twice (signup pass,
    purchase pass): the signup cohort and the day-grain KM table are
    persisted so their multi-consumer lineage doesn't re-derive the
    corpus (caught at 6 scans before the persists)."""
    import __spark_entry__ as m

    df = m.queries()["kaplan_meier"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("events.parquet") <= 2, ps.text[:1200]
    assert "CartesianProduct" not in ps.text


def test_psi_drift_three_corpus_scans(spark, sf_dir):
    """PSI = edges pass + one binning pass per period — exactly three
    corpus scans (caught at 7 before edges/bins were persisted and
    the totals were fused into the binned aggregates)."""
    import __spark_entry__ as m

    df = m.queries()["psi_drift"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("events.parquet") <= 3, ps.text[:1200]
    assert "CartesianProduct" not in ps.text


def test_benford_audit_single_corpus_scan(spark, sf_dir):
    """One (priority, digit) count shuffle; the per-priority totals
    fold out of the persisted digit counts — exactly one orders scan."""
    import __spark_entry__ as m

    df = m.queries()["benford_audit"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("orders.parquet") == 1, ps.text[:1200]


def test_blockhash_near_dup_two_corpus_scans(spark, sf_dir):
    """Signatures persist before the band self-join: 4 bands × 2 join
    sides re-evaluated the signature chain 8 times before (16 corpus
    scans); the fixture's docs∪twins floor is 2."""
    import __spark_entry__ as m

    df = m.queries()["blockhash_near_dup"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("documents.parquet") <= 2, ps.text[:1200]


def test_cdc_apply_bounded_corpus_scans(spark, sf_dir):
    """apply_changes materializes the change-sized diff slice once:
    its three consumers each re-ran the snapshot outer-join before
    (10 orders scans); the floor is old+two fixture branches+target."""
    import __spark_entry__ as m

    df = m.queries()["cdc_apply"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("orders.parquet") <= 4, ps.text[:1200]


def test_funnel_stage_aggregates_persisted(spark, sf_dir):
    """One event-log scan per funnel stage — the stage aggregates are
    user-cardinality and persisted (6 scans before)."""
    import __spark_entry__ as m

    df = m.queries()["funnel_analysis"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("events.parquet") <= 3, ps.text[:1200]


def test_gini_single_fact_scan_no_self_join(spark, sf_dir):
    """Gini = one orders rollup + one customer broadcast + one rank
    window — no self-products, one scan per table."""
    import __spark_entry__ as m

    df = m.queries()["gini_concentration"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("orders.parquet") == 1, ps.text[:1200]
    assert ps.text.count("customer.parquet") == 1
    assert "CartesianProduct" not in ps.text


def test_association_rules_single_fact_scan(spark, sf_dir):
    """The persisted basket relation feeds pair expansion, supports
    and the basket count — the fact table is scanned once and the
    pair expansion is in-row (no basket self-join)."""
    import __spark_entry__ as m

    df = m.queries()["association_rules"](spark, sf_dir)
    ps = plan_summary(df)
    assert ps.text.count("lineitem.parquet") == 1, ps.text[:1200]
    assert "CartesianProduct" not in ps.text
