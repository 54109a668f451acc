"""Embedding-column utilities for training-data pipelines: int8
quantization (storage/bandwidth 4x cut for ANN candidate stages),
L2 normalization, and dimension stats.

All pure ``pyspark.sql.functions`` array ops — JVM-side, no Python in
the hot path, linear scans at 100 TB. Quantization is per-vector
symmetric (scale = max|v| / 127): no codebook state, so the operator
is embarrassingly parallel and streaming-safe.

Determinism note (oracle policy, memory: driver-contract-conventions):
float32 → double widening is exact, scale/round arithmetic is the
same double ops in Spark and DuckDB, and round() rounds half away
from zero in both — so quantized codes are engine-exact and the
driver query compares them as integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def quantize_codes(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, pos, q, scale): per-vector symmetric int8 quantization.

    q = round(v / scale) with scale = max|v| / 127, so q in [-127,
    127]; all-zero vectors quantize to 0 with scale 0. Exploded row
    form because integer rows hash cross-engine (array columns do
    not).
    """
    v = _vec(vec_col)
    scale = (
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))) / 127.0
    )
    out = df.select(
        F.col(id_col),
        scale.alias("scale"),
        F.posexplode(v).alias("pos", "val"),
    )
    q = F.when(F.col("scale") == 0.0, F.lit(0.0)).otherwise(
        F.round(F.col("val") / F.col("scale"), 0)
    )
    return out.select(
        id_col,
        "pos",
        q.cast("bigint").alias("q"),
        F.round("scale", 9).alias("scale"),
    )


def dequantize_error(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, max_abs_err): reconstruction error of the int8 round-trip.

    Bounded by scale/2 per component — the operator's correctness
    contract (tests assert it); returned rounded to 9dp so the value
    itself is oracle-comparable.
    """
    v = _vec(vec_col)
    scale = (
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))) / 127.0
    )
    recon_err = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(
            acc,
            F.abs(
                x
                - F.when(scale == 0.0, F.lit(0.0)).otherwise(
                    F.round(x / scale, 0) * scale
                )
            ),
        ),
    )
    return df.select(
        F.col(id_col),
        F.round(recon_err, 9).alias("max_abs_err"),
        F.round(scale, 9).alias("scale"),
    )


def l2_normalize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Replace ``vec_col`` with its unit-norm double vector (zero
    vectors pass through unchanged)."""
    v = _vec(vec_col)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.when(nrm == 0.0, v).otherwise(F.transform(v, lambda x: x / nrm))
    return df.withColumn(vec_col, unit)


def random_projection(
    df: DataFrame,
    in_dims: int,
    out_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a ±1 sign matrix
    (Achlioptas 2003: database-friendly random projections): project
    ``in_dims``-vectors to ``out_dims`` via
    ``y_j = (1/√out_dims) · Σ_i s(i,j)·x_i`` with s ∈ {+1, −1} —
    the standard cheap dimensionality reduction BEFORE ANN/clustering
    (pairwise distances preserved within (1±ε) w.h.p.). The sign
    matrix derives from the portable md5 ``h32("{seed}:i:j")`` parity,
    so the identical matrix is computable in ANY engine — no fitted
    state, no stored model, no randomness to ship.

    Plan: posexplode the vector (×in_dims, map-side), broadcast-join
    the in_dims×out_dims sign matrix (a few KB — derived from
    ``spark.range``, never collected), then ONE groupBy (id, j) whose
    map-side partial aggregation collapses to out_dims rows per
    vector before the exchange. Linear at corpus scale; the Arrow
    matmul variant (à la ``topk_bruteforce_arrow``) drops in when the
    explode dominates, this relational form is the oracle anchor.

    Determinism: contributions ±x_i are ROUNDED to 6dp and summed as
    DECIMAL(18,6) (order-independent); the 1/√out_dims scale is
    applied after the cast back to double — for power-of-4
    ``out_dims`` (the 16 default) the factor is a binary-exact 2⁻ᵏ,
    so multiplication here equals division by √out_dims in the
    oracle bit-for-bit. Returns (id, rp_dim, value).
    """
    import math

    from lightlane_spark.functions.hashing import h32

    spark = df.sparkSession
    mat = (
        spark.range(in_dims)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(
            spark.range(out_dims).select(F.col("id").cast("int").alias("j"))
        )
        .withColumn(
            "s",
            F.when(
                h32(
                    F.concat(
                        F.lit(f"{seed}:"), F.col("i"), F.lit(":"), F.col("j")
                    )
                )
                % 2
                == 0,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
    )
    comps = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    )
    contrib = F.round(F.col("s") * F.col("x"), 6).cast("decimal(18,6)")
    scale = 1.0 / math.sqrt(out_dims)
    return (
        comps.join(F.broadcast(mat), "i")
        .groupBy(id_col, "j")
        .agg((F.sum(contrib).cast("double") * scale).alias("value"))
        .select(F.col(id_col), F.col("j").alias("rp_dim"), "value")
    )
