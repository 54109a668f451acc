"""IVF ANN: recall vs brute force, self-retrieval, sample-fit parity."""

from __future__ import annotations

from lightlane_spark.operators.similarity import ivf_topk, topk_bruteforce
from lightlane_spark.sources.parquet import read_table


def _recall(exact_rows, approx_rows) -> float:
    exact_set = {(r.query_id, r.vec_id) for r in exact_rows}
    approx_set = {(r.query_id, r.vec_id) for r in approx_rows}
    return len(exact_set & approx_set) / len(exact_set)


def test_ivf_recall_and_self_retrieval(spark, sf_dir):
    """Recall@k ≥ 0.9 contract at the headline config (sample fit,
    fit_fraction=0.5 default). The synthetic embeddings are
    near-uniform (no real cluster structure), so the probe fraction
    here (7/8) is far above what a clustered corpus needs — the
    contract pins the operator, the ratio is the data."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = topk_bruteforce(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=7, max_iter=8).collect()
    assert _recall(exact, approx) >= 0.9, "IVF recall below contract"
    # a query vector always retrieves itself at rank 1 (it lives in its
    # own nearest cluster)
    self_hits = {r.query_id for r in approx if r.vec_id == r.query_id and r.rank == 1}
    assert self_hits == set(range(10))


def test_ivf_full_fit_matches_contract(spark, sf_dir):
    """fit_fraction >= 1 is the full-corpus (debug) fit — same recall
    contract; the sample fit must not be load-bearing for recall at
    this probe fraction."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = topk_bruteforce(emb, queries, k=5).collect()
    approx = ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=7, max_iter=8, fit_fraction=1.0
    ).collect()
    assert _recall(exact, approx) >= 0.9, "IVF full-fit recall below contract"


def test_ivf_sample_fit_deterministic(spark, sf_dir):
    """Seeded sample + seeded KMeans: two runs produce identical
    (query_id, vec_id, rank) sets — required for the driver's
    hash-matched recall-contract row."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    a = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=7, max_iter=4).collect()
    b = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=7, max_iter=4).collect()
    assert {(r.query_id, r.vec_id, r.rank) for r in a} == {
        (r.query_id, r.vec_id, r.rank) for r in b
    }


def test_semantic_dedup_collapses_planted_dups(spark):
    import numpy as np

    from lightlane_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    # two well-separated gaussian blobs + exact dups of ids 0 and 50
    blob_a = rng.normal(0, 0.05, (50, 8)) + np.array([1.0] * 8)
    blob_b = rng.normal(0, 0.05, (50, 8)) + np.array([-1.0] * 8)
    vecs = {i: list(map(float, v)) for i, v in enumerate(np.vstack([blob_a, blob_b]))}
    vecs[900] = vecs[0]
    vecs[950] = vecs[50]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id: bigint, embedding: array<double>"
    )
    out = semantic_dedup(df, n_centroids=2, threshold=0.9999, fit_fraction=1.0)
    rows = {r.vec_id: r.cluster for r in out.collect()}
    assert 900 not in rows and 950 not in rows  # dups collapsed onto min-id
    assert set(rows) == set(range(100))  # nothing else removed
    # blobs land in different clusters (data-adaptive blocking works)
    assert rows[0] != rows[50]
    assert len({rows[i] for i in range(50)}) == 1
    assert len({rows[i] for i in range(50, 100)}) == 1
