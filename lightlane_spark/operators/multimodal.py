"""Multimodal columns (north-star M5): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas stages over ``mapInPandas``.

The Spark-side plumbing — schema contract, batch shape, partitioning —
is real and tested; the actual media decode is STUBBED because decode
libraries (PIL/ffmpeg/torchaudio) are not in this container:

  - Each operator takes a pluggable callable (``decoder`` /
    ``extractor`` / ``resizer``) — the slot a real PIL/ffmpeg/torch
    implementation plugs into, exercised in tests with an injected
    fake "real" decoder so the slot itself is covered, not just the
    raise.
  - ``use_real_decoder=True`` with no callable raises
    ``NotImplementedError`` at the point a real decoder would be
    invoked (clearly marked, slot-in ready).
  - The default path runs a DETERMINISTIC FAKE decoder that derives
    pseudo-metadata purely from the byte content, so pipelines and
    tests exercise the full distributed path end-to-end.

Scale notes: binary payloads ride in the same parquet row group as
their metadata (pointer-to-blob via ``blob_path`` column is the
variant for >100 MB objects); ``mapInPandas`` streams Arrow batches so
executor memory is bounded by batch size, not partition size; frame
sampling/resize are per-row ops — linear, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metadata contract every decoder must fill.
IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, width int, height int, checksum string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture: derive an opaque binary column from text (the
    testdata ships no real media; the engine treats bytes as bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real image decoder: metadata derived
    from byte content only (so any engine can recompute it)."""
    n = len(payload)
    fmt = ["png", "jpeg", "webp"][n % 3]
    width = 64 + (n % 640)
    height = 64 + ((n * 7) % 480)
    return fmt, width, height


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_decoder: bool = False,
    decoder=None,
) -> DataFrame:
    """Extract image metadata from binary payloads via mapInPandas.

    Arrow-batched: the pandas fn sees a batch of (id, payload) and
    emits one metadata row per input — the exact plumbing a real
    decoder uses; only the per-row byte interpretation is stubbed.

    ``decoder``: ``bytes -> (format, width, height)`` — the real-
    decoder slot (e.g. wrap ``PIL.Image.open``); must be picklable,
    shipped to executors by cloudpickle.
    """

    # The closure references module-level _fake_decode, which
    # cloudpickle serializes BY REFERENCE — executors must be able to
    # import lightlane_spark, so ship the package first (shipping.py).
    from lightlane_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if use_real_decoder and decoder is None:
                # STUB: slot a real decoder (PIL.Image.open etc.) here.
                raise NotImplementedError(
                    "real image decoding requires PIL/libvips — not in this container"
                )
            dec = decoder or _fake_decode
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                fmt, width, height = dec(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(payload),
                        "format": fmt,
                        "width": width,
                        "height": height,
                        "checksum": hashlib.md5(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=IMAGE_META_SCHEMA
    )


def extract_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_extractor: bool = False,
    extractor=None,
) -> DataFrame:
    """Feature-extraction plumbing: binary payload → ``array<float>``
    embedding via mapInPandas, the shape a CLIP/ResNet encoder uses
    (model broadcast to executors, Arrow batches in, vectors out).

    ``extractor``: ``bytes -> list[float]`` — the real-encoder slot.
    Without one, the deterministic fake derives a unit-norm vector
    from the payload's md5 so the downstream similarity operators
    (operators/similarity.py) run end-to-end on the output.
    """
    from lightlane_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            if use_real_extractor and extractor is None:
                # STUB: load the broadcast model and encode here.
                raise NotImplementedError(
                    "real feature extraction requires torch/onnx — not in this container"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if extractor is not None:
                    rows.append(
                        {"doc_id": doc_id, "embedding": extractor(bytes(payload))}
                    )
                    continue
                digest = hashlib.md5(bytes(payload)).digest()
                # expand the 16-byte digest to `dim` centered floats
                raw = [
                    (digest[i % 16] ^ (31 * (i // 16))) / 255.0 - 0.5
                    for i in range(dim)
                ]
                n = math.sqrt(sum(v * v for v in raw)) or 1.0
                rows.append({"doc_id": doc_id, "embedding": [v / n for v in raw]})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        feat_batches, schema=f"{id_col} bigint, embedding array<float>"
    )


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_decoder: bool = False,
    resizer=None,
) -> DataFrame:
    """Resize plumbing: payload → payload' with recorded target dims.

    ``resizer``: ``(bytes, width, height) -> bytes`` — the real
    decode→resample→re-encode slot. Without one the byte transform is
    an identity passthrough — schema, batching, and the
    payload-in/payload-out contract are the real thing. Linear, no
    shuffle."""
    from lightlane_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder and resizer is None:
                # STUB: decode → resample to (width, height) → re-encode.
                raise NotImplementedError(
                    "real resize requires PIL/libvips — not in this container"
                )
            out = pdf[[id_col, payload_col]].copy()
            if resizer is not None:
                out[payload_col] = [
                    resizer(bytes(p), width, height) for p in out[payload_col]
                ]
            out["width"] = width
            out["height"] = height
            yield out

    return df.select(id_col, payload_col).mapInPandas(
        resize_batches,
        schema=f"{id_col} bigint, {payload_col} binary, width int, height int",
    )


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled offset
    (stand-in for video frame extraction — same explode shape).
    JVM-side: no Python needed for the sampling skeleton itself."""
    n = F.length(F.col(payload_col))
    offsets = F.sequence(F.lit(0), n - 1, F.lit(every_n_bytes))
    return df.select(
        id_col, n.alias("n_bytes"), F.explode(offsets).alias("frame_offset")
    )


BLOCKHASH_SCHEMA = "doc_id bigint, sig bigint"

# 14 chunk-nibbles (56 bits, fits signed 64); 4 bands sized 4/4/3/3
# nibbles — pigeonhole: ≤3 mismatched chunks leave ≥1 band untouched,
# so exact band-key matching is a LOSSLESS candidate filter for
# distance ≤ 3 (same argument as MinHash-LSH banding).
BLOCKHASH_CHUNKS = 14
BLOCKHASH_BANDS = [(0, 16), (16, 16), (32, 12), (44, 12)]  # (bit offset, width)


def blockhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """ssdeep-style chunked block-hash over opaque BINARY payloads:
    the payload splits into 14 equal byte ranges (fixed grid), each
    chunk contributes the low nibble of its md5 — a 56-bit structural
    fingerprint where same-length payloads differing in a local edit
    differ in 1-2 nibbles. Arrow-batched mapInPandas (the binary
    column never becomes a string); linear, no shuffle.

    Known limitation, by design of fixed-grid block hashing: an edit
    that CHANGES LENGTH shifts every chunk boundary and randomizes
    the signature — rolling-boundary (CTPH) hashing fixes that at the
    cost of content-defined chunking; this operator is the grid
    variant."""
    import hashlib

    n_chunks = BLOCKHASH_CHUNKS

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, sigs = [], []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n = len(b)
                sig = 0
                for i in range(n_chunks):
                    lo = (i * n) // n_chunks
                    hi = ((i + 1) * n) // n_chunks
                    nib = int(hashlib.md5(b[lo:hi]).hexdigest()[0], 16)
                    sig |= nib << (4 * i)
                ids.append(pid)
                sigs.append(sig)
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(gen, BLOCKHASH_SCHEMA)


def blockhash_near_pairs(sig_df: DataFrame, max_diff_chunks: int = 3) -> DataFrame:
    """Near-dup pairs from block-hash signatures: band-bucket join
    (lossless for distance ≤ 3 by pigeonhole over the 4 bands), then
    the exact chunk-mismatch count on candidates only — never
    all-pairs. Mirrors the MinHash-LSH candidate shape; Σ|bucket|²
    is bounded because full-band collisions require 4/3 identical
    chunk hashes.

    The signature relation is materialized ONCE up front (narrow:
    id + one long per doc — the standard LSH practice): the 4 band
    projections × 2 self-join sides would otherwise re-evaluate the
    full signature chain 8 times, each pulling its corpus lineage
    (caught at 16 corpus scans in the r7 plan audit; plan test pins
    the count)."""
    from lightlane_spark.cache import tracked_persist

    sig_df = tracked_persist(sig_df.select("doc_id", "sig"))
    bands = []
    for band_id, (off, width) in enumerate(BLOCKHASH_BANDS):
        mask = (1 << width) - 1
        bands.append(
            sig_df.select(
                "doc_id",
                "sig",
                F.lit(band_id).alias("band"),
                (F.shiftright("sig", off).bitwiseAND(F.lit(mask))).alias("key"),
            )
        )
    b = bands[0]
    for p in bands[1:]:
        b = b.unionByName(p)
    left = b.select(
        F.col("doc_id").alias("a_id"), F.col("sig").alias("sa"), "band", "key"
    )
    right = b.select(
        F.col("doc_id").alias("b_id"), F.col("sig").alias("sb"), "band", "key"
    )
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "sa", "sb")
        .distinct()
    )
    diff = None
    for i in range(BLOCKHASH_CHUNKS):
        na = F.shiftright("sa", 4 * i).bitwiseAND(F.lit(15))
        nb = F.shiftright("sb", 4 * i).bitwiseAND(F.lit(15))
        term = F.when(na != nb, 1).otherwise(0)
        diff = term if diff is None else diff + term
    return (
        cand.withColumn("n_diff_chunks", diff)
        .filter(F.col("n_diff_chunks") <= max_diff_chunks)
        .select("a_id", "b_id", "n_diff_chunks")
        .orderBy("a_id", "b_id")
    )
