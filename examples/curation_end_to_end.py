"""End-to-end corpus curation at sf0.001 — the training-data pipeline
in ~40 lines: quality gate -> language id -> near-dup collapse ->
per-source quota sample -> token accounting -> packed sequences
written to parquet.

Run: python examples/curation_end_to_end.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from lightlane_spark import get_spark, read_table
    from lightlane_spark.operators.clustering import dedup_by_components
    from lightlane_spark.operators.fuzzy_dedup import dedup_minhash
    from lightlane_spark.operators.text import (
        language_id,
        pack_sequences,
        quality_score,
        quota_sample,
        token_count,
    )

    spark = get_spark(app_name="example-curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality + language gates — all JVM-side expressions, map-only
    gated = (
        docs.withColumn("q", quality_score(F.col("text")))
        .withColumn("lang_pred", language_id(F.col("text")))
        .where((F.col("q") >= 0.3) & F.col("lang_pred").isNotNull())
    )

    # 2. near-dup collapse: MinHash-LSH pairs -> components -> min id
    pairs = dedup_minhash(gated.select("doc_id", "text"), threshold=0.7)
    deduped = dedup_by_components(gated, pairs.select("id_a", "id_b"))

    # 3. per-source quota sample + token accounting
    sampled = quota_sample(deduped, "source", n_per_group=50)
    toks = sampled.withColumn("n_tokens", token_count(F.col("text")))
    stats = toks.agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).first()

    # 4. pack into 256-token training sequences, write
    packed = pack_sequences(toks, "n_tokens", window_tokens=256)
    out = tempfile.mkdtemp(prefix="curated_") + "/packed"
    packed.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out).count()

    report = {
        "input_docs": n0,
        "after_dedup": deduped.count(),
        "sampled_docs": stats["docs"],
        "total_tokens": stats["tokens"],
        "packed_rows": back,
        "output": out,
    }
    print(report)
    assert report["sampled_docs"] <= report["after_dedup"] <= report["input_docs"]
    assert report["packed_rows"] > 0
    return report


if __name__ == "__main__":
    main(*sys.argv[1:2])
