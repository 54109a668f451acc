"""Product quantization: recall contract vs brute force, code shape /
compression, encode determinism, and codebook reuse."""

from __future__ import annotations

import pytest

from lightlane_spark.operators.pq import pq_encode, pq_fit, pq_topk
from lightlane_spark.operators.similarity import topk_bruteforce
from lightlane_spark.sources.parquet import read_table


def _recall(exact_rows, approx_rows) -> float:
    exact = {(r.query_id, r.vec_id) for r in exact_rows}
    approx = {(r.query_id, r.vec_id) for r in approx_rows}
    return len(exact & approx) / len(exact)


def test_pq_recall_and_self_retrieval(spark, sf_dir):
    """Recall@5 ≥ 0.9 at the headline config (m=16 4-dim subspaces,
    16 centers each = 64-bit codes, 32× smaller than float32;
    shortlist=200 then exact re-rank). The synthetic embeddings are
    near-uniform — the hardest case for PQ, since there is no cluster
    structure for codebooks to exploit — measured recall is 1.0."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = topk_bruteforce(emb, queries, k=5).collect()
    approx = pq_topk(emb, queries, k=5).collect()
    assert _recall(exact, approx) >= 0.9
    self_hits = {r.query_id for r in approx if r.vec_id == r.query_id and r.rank == 1}
    assert self_hits == set(range(10))


def test_pq_codes_shape_and_determinism(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=16, k=16)
    assert len(books) == 16 and all(len(b) == 16 for b in books)
    assert all(len(c) == 4 for b in books for c in b)  # 64/16 dims
    codes_a = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    codes_b = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    assert codes_a == codes_b, "encode must be deterministic"
    assert all(len(c) == 16 for c in codes_a.values())
    assert all(0 <= x < 16 for c in codes_a.values() for x in c)


def test_pq_precomputed_codes_match_inline(spark, sf_dir):
    """The production shape (codes written once, reused per query
    batch) must return exactly what the inline fit returns."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    books = pq_fit(emb)
    codes = pq_encode(emb, books)
    a = pq_topk(emb, queries, k=5, codebooks=books, codes=codes).collect()
    b = pq_topk(emb, queries, k=5).collect()
    assert {(r.query_id, r.vec_id, r.rank) for r in a} == {
        (r.query_id, r.vec_id, r.rank) for r in b
    }


def test_pq_fit_rejects_indivisible_dims(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb, m=7)


def test_pq_fit_tiny_and_empty_inputs(spark, sf_dir):
    """Fewer sample rows than centers must still produce k valid
    centers (cycled points); an empty corpus raises clearly."""
    import pytest as _pytest

    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb.filter("vec_id < 3"), m=16, k=16)
    assert len(books) == 16 and all(len(b) == 16 for b in books)
    with _pytest.raises(Exception, match="empty"):
        pq_fit(emb.filter("vec_id < 0"), m=16, k=16)
