"""IVF ANN: recall vs brute force, self-retrieval, determinism."""

from __future__ import annotations

from lightlane_spark.operators.similarity import ivf_topk, topk_bruteforce
from lightlane_spark.sources.parquet import read_table


def test_ivf_recall_and_self_retrieval(spark, sf_dir):
    """Recall@k ≥ 0.9 contract at the headline config. The synthetic
    embeddings are near-uniform (no real cluster structure), so the
    probe fraction here (7/8) is far above what a clustered corpus
    needs — the contract pins the operator, the ratio is the data."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = topk_bruteforce(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=7, max_iter=8).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, f"IVF recall {recall} below contract"
    # a query vector always retrieves itself at rank 1 (it lives in its
    # own nearest cluster)
    self_hits = {r.query_id for r in approx if r.vec_id == r.query_id and r.rank == 1}
    assert self_hits == set(range(10))
