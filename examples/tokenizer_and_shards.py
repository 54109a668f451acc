"""Tokenizer training + reproducible shard manifest at sf0.001 — the
pretraining-prep tail of the pipeline in ~40 lines: corpus drift check
→ exact BPE merges → vocab-mapped tokenization → deterministic shard
order → contrastive negative pairs for the embedding side-channel.

Run: python examples/tokenizer_and_shards.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from lightlane_spark import get_spark, read_table
    from lightlane_spark.operators.text import bpe_train
    import lightlane_spark.queries_m5 as m5

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Did the new crawl shift the vocabulary? (gate before training)
    drift = m5.q_vocab_drift(spark, sf_dir)
    top_mover = drift.first()
    # rate_ratio is the raw (engine-deterministic) ratio; the classic
    # log-ratio is the consumer's one-liner
    import math

    print(
        "top drift term:", top_mover["term"],
        round(math.log(top_mover["rate_ratio"]), 3),
    )

    # 2. Exact BPE merges (the trainer's artifact — scale note: every
    #    round runs on the vocabulary relation, not the corpus)
    docs = read_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_rounds=5)
    merges.show(5, truncate=False)

    # 3. Reproducible global shard manifest (stable under reruns,
    #    engine swaps, and corpus growth)
    manifest = m5.q_deterministic_shuffle(spark, sf_dir)
    shard_sizes = manifest.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    print("shards:", sorted(tuple(r) for r in shard_sizes.collect()))

    # 4. Contrastive negatives (bucket-local hash ring — no global
    #    window, no cross join)
    negs = m5.q_negative_pairs(spark, sf_dir)
    n_negs = negs.count()
    print("negative pairs:", n_negs)

    return {
        "n_merges": merges.count(),
        "n_docs_in_manifest": manifest.count(),
        "n_negative_pairs": n_negs,
    }


if __name__ == "__main__":
    out = main(*(sys.argv[1:2] or []))
    print(out)
