"""Dedup family walkthrough at sf0.001: the same planted-duplicate
corpus through exact, MinHash-LSH, SimHash, and the exact
prefix-filtered Jaccard join — printing what each finds and what it
costs, so the trade-offs in CHOOSING.md are reproducible.

Run: python examples/dedup_walkthrough.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from lightlane_spark import get_spark, read_table
    from lightlane_spark.operators.fuzzy_dedup import (
        dedup_exact,
        dedup_minhash,
        prefix_filter_jaccard_join,
        simhash_near_pairs,
        simhash_signatures,
    )

    spark = get_spark(app_name="example-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant duplicates: every 5th verbatim, every 7th missing one word
    corpus = (
        docs.unionByName(
            docs.where("doc_id % 5 = 0").select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            )
        ).unionByName(
            docs.where("doc_id % 7 = 0").select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
            )
        )
    ).cache()
    n = corpus.count()
    report = {"corpus_docs": n}

    t0 = time.monotonic()
    report["exact_survivors"] = dedup_exact(corpus).count()
    report["exact_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    report["minhash_pairs"] = dedup_minhash(corpus, threshold=0.7).count()
    report["minhash_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    sigs = simhash_signatures(corpus)
    report["simhash_pairs"] = simhash_near_pairs(sigs, max_hamming=3).count()
    report["simhash_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    report["prefix_exact_pairs"] = prefix_filter_jaccard_join(
        corpus, threshold=0.7
    ).count()
    report["prefix_sec"] = round(time.monotonic() - t0, 2)

    print(report)
    # the verbatim dups disappear under exact dedup
    assert report["exact_survivors"] < report["corpus_docs"]
    # MinHash (probabilistic discovery) finds at most the exact pair set
    assert report["minhash_pairs"] <= report["prefix_exact_pairs"]
    return report


if __name__ == "__main__":
    main(*sys.argv[1:2])
