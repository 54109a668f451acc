"""Retrieval walkthrough at sf0.001: BM25 lexical ranking, hashed-BoW
cosine ranking, and reciprocal-rank fusion — then the vector side
(LSH ANN, with a metadata filter) over the embeddings table.

Run: python examples/retrieval_walkthrough.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from pyspark.sql import Window as W

    from lightlane_spark import get_spark, read_table
    from lightlane_spark.operators.similarity import ann_topk_lsh, topk_bruteforce
    from lightlane_spark.operators.text import bm25_topk, hashed_bow, rrf_fuse

    spark = get_spark(app_name="example-retrieval")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = ["table", "join", "scan"]

    # lexical leg
    lex = bm25_topk(docs, terms, k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.col("score").desc(), "doc_id"))
    )
    top_lex = [r.doc_id for r in lex.limit(5).collect()]

    # vector-space leg over hashed bag-of-words
    bow = hashed_bow(docs, dims=64)
    qbow = hashed_bow(
        spark.createDataFrame([(0, " ".join(terms))], "doc_id: bigint, text: string")
    ).select(F.col("dim").alias("qdim"), F.col("weight").alias("qw"))
    dots = (
        bow.join(F.broadcast(qbow), bow["dim"] == F.col("qdim"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("qw")).alias("dot"))
    )
    norms = bow.groupBy("doc_id").agg(F.sum(F.col("weight") ** 2).alias("nd"))
    vec = (
        dots.join(norms, "doc_id")
        .select("doc_id", (F.col("dot") / F.sqrt("nd")).alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(20)
        .withColumn("rank", F.row_number().over(W.orderBy(F.col("s").desc(), "doc_id")))
    )

    fused = rrf_fuse([lex.select("doc_id", "rank"), vec.select("doc_id", "rank")], k=10)
    top_fused = [r.doc_id for r in fused.collect()]

    # embedding ANN: exact vs LSH vs metadata-filtered LSH
    emb = read_table(spark, sf_dir, "embeddings")
    probes = emb.filter("vec_id < 3")
    exact = topk_bruteforce(emb, probes, k=5)
    approx = ann_topk_lsh(emb, probes, dims=64, k=5, num_bits=4, num_tables=4)
    filtered = ann_topk_lsh(
        emb.filter("label % 2 = 0"), probes, dims=64, k=5, num_bits=4, num_tables=4
    )
    hit = (
        approx.select("query_id", "vec_id")
        .join(exact.select("query_id", "vec_id"), ["query_id", "vec_id"])
        .count()
    )
    report = {
        "bm25_top5": top_lex,
        "fused_top10": top_fused,
        "ann_recall_hits": hit,
        "ann_total": exact.count(),
        "filtered_rows": filtered.count(),
    }
    print(report)
    assert len(top_fused) == 10 and hit > 0
    # filtered results only contain even-label vectors
    odd = (
        filtered.join(emb.select("vec_id", "label"), "vec_id")
        .where("label % 2 = 1")
        .count()
    )
    assert odd == 0
    return report


if __name__ == "__main__":
    main(*sys.argv[1:2])
