"""Unit contracts for operators/embeddings.py: code range, error
bound, zero-vector handling, unit norms."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightlane_spark.operators.embeddings import (
    dequantize_error,
    l2_normalize,
    quantize_codes,
)


def _fixture(spark):
    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        (3, [127.0, -127.0, 1.0, -1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")


def test_quantize_codes_range_and_zero_vector(spark):
    out = quantize_codes(_fixture(spark)).collect()
    assert all(-127 <= r.q <= 127 for r in out)
    by_vec = {}
    for r in out:
        by_vec.setdefault(r.vec_id, {})[r.pos] = r.q
    # max component always quantizes to ±127
    assert by_vec[1][1] == -127
    assert by_vec[3][0] == 127 and by_vec[3][1] == -127
    # zero vector → all-zero codes, scale 0
    assert set(by_vec[2].values()) == {0}
    assert all(r.scale == 0.0 for r in out if r.vec_id == 2)


def test_dequantize_error_bounded_by_half_scale(spark):
    out = dequantize_error(_fixture(spark)).collect()
    for r in out:
        assert r.max_abs_err <= r.scale / 2 + 1e-9


def test_dequantize_error_real_embeddings(spark, sf_dir):
    from lightlane_spark.sources.parquet import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = dequantize_error(emb)
    bad = out.filter(F.col("max_abs_err") > F.col("scale") / 2 + 1e-9).count()
    assert bad == 0


def test_l2_normalize(spark):
    out = l2_normalize(_fixture(spark)).collect()
    for r in out:
        n = sum(x * x for x in r.embedding) ** 0.5
        if r.vec_id == 2:
            assert n == 0.0  # zero vector passes through
        else:
            assert abs(n - 1.0) < 1e-12


def test_random_projection_preserves_relative_distances(spark):
    """JL contract on a controlled fixture: after 64→16 projection,
    a pair of identical vectors stays at distance 0, and a far pair
    stays much farther than a near pair (rank preservation — the
    property ANN-after-projection relies on). Also pins determinism:
    the md5 sign matrix makes repeated runs bit-identical."""
    import math
    import random

    from pyspark.sql import functions as F

    from lightlane_spark.operators.embeddings import random_projection

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x + 0.01 for x in base]
    far = [-x for x in base]
    rows = [(1, base), (2, list(base)), (3, near), (4, far)]
    df = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")

    out = random_projection(df, in_dims=64, out_dims=16)
    vecs = {}
    for r in out.collect():
        vecs.setdefault(r.vec_id, {})[r.rp_dim] = r.value
    assert all(len(v) == 16 for v in vecs.values())

    def dist(a, b):
        return math.sqrt(sum((vecs[a][j] - vecs[b][j]) ** 2 for j in range(16)))

    assert dist(1, 2) == 0.0  # identical in, identical out
    assert dist(1, 4) > 5 * dist(1, 3)  # far stays far, near stays near

    again = {
        (r.vec_id, r.rp_dim): r.value
        for r in random_projection(df, in_dims=64, out_dims=16).collect()
    }
    assert all(again[(i, j)] == vecs[i][j] for i in vecs for j in range(16))
