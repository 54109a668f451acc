"""Cache-composition contract (VERDICT r5 ask #6 / r6 ask #5): every
persist inside the library registers through
``lightlane_spark.cache.tracked_persist``, so a composing session can
release library-held cache deterministically — ``cache_scope()`` per
unit of work, or ``unpersist_all()`` at any point — instead of relying
on LRU eviction to eventually reclaim corpus-sized frames.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lightlane_spark import cache
from lightlane_spark.operators.fuzzy_dedup import dedup_minhash


def _n_cached_rdds(spark) -> int:
    """Materialized cache blocks registered with the context. SQL
    cache entries appear here once their first action runs, so after
    counting a persisted frame the number is > 0 iff cached data is
    actually being held."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture()
def docs(spark):
    rows = [(i, f"alpha beta gamma delta epsilon doc {i % 7} common tail") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def test_cache_scope_releases_library_persists(spark, docs):
    spark.catalog.clearCache()
    cache.unpersist_all()
    assert _cache_manager_empty(spark)
    # baseline, not zero: earlier tests' localCheckpoint RDDs linger
    # (by design — ContextCleaner reclaims them); the contract is that
    # THIS scope adds nothing that survives it
    baseline = _n_cached_rdds(spark)
    with cache.cache_scope():
        dedup_minhash(docs).count()  # persists shingles/buckets/cands
        assert not _cache_manager_empty(spark), (
            "dedup_minhash should persist intermediates inside the scope"
        )
    assert _cache_manager_empty(spark), (
        "cache_scope exit must release every library persist"
    )
    assert _n_cached_rdds(spark) <= baseline


def test_unpersist_all_releases_and_reports(spark, docs):
    spark.catalog.clearCache()
    cache.unpersist_all()
    dedup_minhash(docs).count()
    assert not _cache_manager_empty(spark)
    released = cache.unpersist_all()
    assert released >= 3  # shingles + buckets + candidate pairs
    assert _cache_manager_empty(spark)
    # idempotent: nothing tracked, nothing released
    assert cache.unpersist_all() == 0


def test_scope_does_not_touch_caller_persists(spark, docs):
    spark.catalog.clearCache()
    cache.unpersist_all()
    mine = docs.select("doc_id", F.length("text").alias("n")).persist()
    mine.count()
    with cache.cache_scope():
        dedup_minhash(docs).count()
    assert not _cache_manager_empty(spark), (
        "caller-owned persist must survive a library cache_scope"
    )
    mine.unpersist(blocking=True)
    assert _cache_manager_empty(spark)


def test_tracked_persist_dedupes_registry(spark, docs):
    """Re-registering the same frame must not grow the registry
    (ADVICE r8: loop-heavy sessions calling cms_estimate/bloom_member
    against one pinned sketch accumulated one strong ref per call)."""
    spark.catalog.clearCache()
    cache.unpersist_all()
    frame = docs.select("doc_id")
    for _ in range(5):
        out = cache.tracked_persist(frame)
    assert len(cache._TRACKED) == 1
    assert out is frame  # persist() returns the same wrapper
    # outer registration point wins: an inner scope re-pin is a no-op
    with cache.cache_scope():
        cache.tracked_persist(frame)
        assert len(cache._TRACKED) == 1
    frame.count()
    assert not _cache_manager_empty(spark), (
        "inner-scope exit must not release the outer-scope pin"
    )
    assert cache.unpersist_all() == 1
    assert _cache_manager_empty(spark)
    assert not cache._TRACKED_IDS


def test_fresh_queries_run_leaves_no_cache_under_scope(spark, sf_dir):
    """The composition contract end-to-end: wrap cache-heavy
    ``queries()`` entries in one scope; on exit the session holds no
    cached frames at all."""
    import __spark_entry__ as m

    qs = m.queries()
    spark.catalog.clearCache()
    cache.unpersist_all()
    baseline = _n_cached_rdds(spark)  # earlier tests' localCheckpoints
    with cache.cache_scope():
        for name in ("minhash_lsh_pairs", "bm25_topk"):
            qs[name](spark, sf_dir).count()
    assert _cache_manager_empty(spark)
    assert _n_cached_rdds(spark) <= baseline
