"""Stale-session memo eviction (ADVICE r13 / VERDICT r13 ask #6).

Every session-scoped memo (parsed-Column and inferred-schema caches)
must hold only the LIVE applicationId's entries after a miss: a miss
under a new appId is the session-cycle moment, and one process has one
active SparkContext, so other appIds' entries are dead py4j refs.
Cycling a real second SparkContext inside the suite would tear down
the session fixture; planting a foreign-appId key and triggering a
miss exercises the identical code path (evict_stale runs on miss,
keyed by the live appId).
"""

from __future__ import annotations

from lightlane_spark.memo import evict_stale


def test_evict_stale_tuple_and_scalar_keys():
    memo = {
        ("app-old", 16): "stale-tuple",
        "app-old": "stale-scalar",
        ("app-live", 16): "live-tuple",
        "app-live": "live-scalar",
    }
    evict_stale(memo, "app-live")
    assert set(memo) == {("app-live", 16), "app-live"}


def test_sig_and_band_and_pair_memos_evict_on_miss(spark):
    from lightlane_spark.operators import fuzzy_dedup as fd

    app = spark.sparkContext.applicationId
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id bigint, text string"
    )
    sh = fd.shingle(docs, k=3, distinct=False)
    fd._SIG_EXPR_MEMO[("dead-app", 16)] = "stale"
    fd._BAND_EXPR_MEMO[("dead-app", 4, 4)] = "stale"
    fd._PAIR_EXPR_MEMO["dead-app"] = "stale"
    # force misses under the live appId so eviction runs in each memo
    fd._SIG_EXPR_MEMO.pop((app, 16), None)
    fd._BAND_EXPR_MEMO.pop((app, 4, 4), None)
    fd._PAIR_EXPR_MEMO.pop(app, None)
    pairs = fd.dedup_minhash(docs)
    pairs.count()
    for memo in (fd._SIG_EXPR_MEMO, fd._BAND_EXPR_MEMO, fd._PAIR_EXPR_MEMO):
        apps = {k[0] if isinstance(k, tuple) else k for k in memo}
        assert apps == {app}
    from lightlane_spark.cache import unpersist_all

    unpersist_all()


def test_schema_memo_evicts_on_miss(spark, sf_dir):
    from lightlane_spark.sources import parquet as pq

    app = spark.sparkContext.applicationId
    pq._SCHEMA_MEMO[("dead-app", "/nowhere.parquet", 0, 0)] = "stale"
    # drop any live entry for this table so the read is a miss
    for k in [k for k in pq._SCHEMA_MEMO if k[0] == app]:
        del pq._SCHEMA_MEMO[k]
    pq.read_table(spark, sf_dir, "region").count()
    assert {k[0] for k in pq._SCHEMA_MEMO} == {app}


def test_hyperplane_memo_evicts_on_miss(spark):
    from lightlane_spark.operators import similarity as sim

    app = spark.sparkContext.applicationId
    sim._HP_EXPR_MEMO[("dead-app", "some sql")] = "stale"
    for k in [k for k in sim._HP_EXPR_MEMO if k[0] == app]:
        del sim._HP_EXPR_MEMO[k]
    sim.hyperplane_bits("v", dims=4, num_bits=2)
    assert {k[0] for k in sim._HP_EXPR_MEMO} == {app}
