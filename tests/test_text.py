"""M5 text analysis + portable hashing."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from lightlane_spark.functions.hashing import h32
from lightlane_spark.operators.text import (
    analyze_documents,
    fingerprint_md5,
    language_id,
    quality_score,
    subword_count,
    token_count,
)
from lightlane_spark.sources.parquet import read_table, table_path


def test_h32_matches_duckdb(spark):
    vals = ["abc", "", "the fast key", "ünïcode"]
    df = spark.createDataFrame([(v,) for v in vals], "s: string").withColumn(
        "h", h32("s")
    ).withColumn("h7", h32("s", seed=7))
    got = {(r.s): (r.h, r.h7) for r in df.collect()}
    for v in vals:
        d = duckdb.sql(
            "SELECT ('0x'||substr(md5(?),1,8))::BIGINT, "
            "('0x'||substr(md5('7:' || ?),1,8))::BIGINT",
            params=[v, v],
        ).fetchone()
        assert got[v] == d, v


def test_token_count_and_subwords(spark):
    df = spark.createDataFrame([("a bb ccc", "don't stop-me now!")], "t1: string, t2: string")
    r = df.select(
        token_count("t1").alias("n1"), subword_count("t2").alias("n2")
    ).first()
    assert r.n1 == 3
    # don ' t stop - me now ! → 8
    assert r.n2 == 8


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is fine",),
            ("der hund ist ein tier und das ist gut",),
            ("el perro es un animal y la casa es grande",),
            ("zzz qqq xxx",),
        ],
        "text: string",
    )
    out = [r.l for r in df.select(language_id("text").alias("l")).collect()]
    assert out[0] == "en" and out[1] == "de" and out[2] == "es" and out[3] == "und"


def test_quality_score_bounds(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    stats = docs.select(quality_score("text").alias("q")).agg(
        F.min("q"), F.max("q")
    ).first()
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_fingerprint_md5_normalizes(spark):
    df = spark.createDataFrame(
        [("  Hello   World ",), ("hello world",)], "text: string"
    )
    fps = [r.fp for r in df.select(fingerprint_md5("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_analyze_documents_bundle(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    out = analyze_documents(docs)
    assert {"n_tokens", "n_subwords", "lang_guess", "quality", "fp_md5", "fp_rolling"} <= set(
        out.columns
    )
    assert out.count() == 50
    # n_tokens must agree with duckdb's split length on the same rows
    exp = dict(
        duckdb.sql(
            f"SELECT doc_id, len(string_split(text,' ')) FROM '{table_path(sf_dir, 'documents')}' "
            "ORDER BY doc_id LIMIT 50"
        ).fetchall()
    )
    got = {r.doc_id: r.n_tokens for r in out.select("doc_id", "n_tokens").collect()}
    assert got == exp


def test_quota_sample_cap_and_determinism(spark, sf_dir):
    from lightlane_spark.operators.text import quota_sample

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = quota_sample(docs, "source", 7)
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 7 for n in per.values())
    assert all(per[s] == min(7, full[s]) for s in full)
    # deterministic: same selection on re-run
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {r.doc_id for r in quota_sample(docs, "source", 7).collect()}
    assert ids1 == ids2


def test_weighted_sample_rate_and_determinism(spark, sf_dir):
    from lightlane_spark.operators.text import weighted_sample

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = docs.withColumn("weight", F.least(F.col("n_chars") / 600.0, F.lit(1.0)))
    kept = weighted_sample(w, "weight")
    n, total = kept.count(), docs.count()
    mean_w = w.agg(F.avg("weight")).first()[0]
    # kept fraction tracks the mean weight (law of large numbers, 500 docs)
    assert abs(n / total - mean_w) < 0.1
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in weighted_sample(w, "weight").collect()}
    # different seed -> different (deterministic) sample
    other = weighted_sample(w, "weight", seed="ws2")
    assert {r.doc_id for r in other.collect()} != {r.doc_id for r in kept.collect()}


def test_pack_sequences_invariants(spark, sf_dir):
    """Every token of every doc lands in exactly one sequence slice;
    no sequence holds more than window_tokens; slices are contiguous."""
    from lightlane_spark.operators.text import pack_sequences, token_count

    W = 128
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n")
    )
    out = pack_sequences(docs, "n", window_tokens=W, buckets=4)
    rows = out.collect()
    n_by_doc = {r.doc_id: r.n for r in docs.collect()}
    # per-doc slices cover [0, n) without gaps or overlaps
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.doc_start, r.doc_end))
    for doc_id, slices in by_doc.items():
        slices.sort()
        assert slices[0][0] == 0
        assert slices[-1][1] == n_by_doc[doc_id]
        assert all(a[1] == b[0] for a, b in zip(slices, slices[1:]))
        assert all(e > s for s, e in slices)
    assert set(by_doc) == {d for d, n in n_by_doc.items() if n > 0}
    # sequence capacity: sum of slice lengths per (bucket, seq) <= W,
    # and every sequence except each bucket's last is exactly full
    per_seq = {}
    for r in rows:
        per_seq[(r.bucket, r.seq_id)] = per_seq.get((r.bucket, r.seq_id), 0) + (r.doc_end - r.doc_start)
    last_seq = {}
    for (b, s) in per_seq:
        last_seq[b] = max(last_seq.get(b, -1), s)
    for (b, s), tok in per_seq.items():
        assert tok <= W
        if s < last_seq[b]:
            assert tok == W, (b, s, tok)


def test_span_dedup_semantics(spark):
    from lightlane_spark.operators.text import span_dedup

    a = " ".join(f"w{i}" for i in range(8))          # span A
    b = " ".join(f"x{i}" for i in range(8))          # span B
    c = " ".join(f"y{i}" for i in range(8))          # span C
    df = spark.createDataFrame(
        [
            (1, f"{a} {b}"),   # doc 1 owns A and B
            (2, f"{a} {c}"),   # doc 2: A is a repeat, C unique
            (3, a),            # doc 3: fully duplicate -> emptied
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in span_dedup(df, span=8).collect()}
    assert out[1].text_deduped == f"{a} {b}"
    assert (out[1].n_spans, out[1].n_spans_kept) == (2, 2)
    assert out[2].text_deduped == c
    assert (out[2].n_spans, out[2].n_spans_kept) == (2, 1)
    assert out[3].text_deduped == ""
    assert (out[3].n_spans, out[3].n_spans_kept) == (1, 0)


def test_select_top_quality_threshold_semantics(spark, sf_dir):
    """Keepers are exactly the docs at/above the corpus p-quantile;
    the approx variant agrees within its rank tolerance."""
    from pyspark.sql import functions as F

    from lightlane_spark.operators.text import quality_score, select_top_quality
    from lightlane_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", quality_score("text").alias("q"))
    thr = scored.agg(F.expr("percentile(q, 0.8)")).first()[0]
    expect = scored.filter(F.col("q") >= thr).count()
    exact = select_top_quality(docs, p=0.8)
    assert exact.count() == expect
    assert exact.filter(F.col("quality") < thr).count() == 0
    # approx keeps a similar band (tolerance: 10% of corpus size)
    approx = select_top_quality(docs, p=0.8, approx=True).count()
    assert abs(approx - expect) <= 0.1 * docs.count()


def test_gopher_rules_battery(spark):
    """Each rule trips on its designed pathology; clean prose keeps."""
    from lightlane_spark.operators.text import gopher_rules

    clean = "the quick brown fox jumps over and over to find all of " + " ".join(
        ["word"] * 50
    )
    rows = [
        (1, clean),                                         # keeps
        (2, "the of short"),                                # wc_ok fails
        (3, "the of " + " ".join(["x"] * 60)),              # mwl (mean<3) fails
        (4, "the of " + " ".join(["####"] * 30) + " " + " ".join(["word"] * 30)),  # symbol
        (5, "\n".join(["- item the of"] * 10) + "\n" + " ".join(["word"] * 50)),   # bullet ok (1 non-bullet of 11)
        (6, "the of " + " ".join(["123"] * 60)),            # alpha fails
        (7, " ".join(["word"] * 60)),                       # stopword fails
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in gopher_rules(df, min_words=20).collect()}
    assert got[1].keep
    assert not got[2].wc_ok
    assert not got[3].mwl_ok
    assert not got[4].symbol_ok
    assert not got[6].alpha_ok
    assert not got[7].stopword_ok
    # bullet rule: 10 of 11 lines bulleted (90.9% > 90%) → fails
    assert not got[5].bullet_ok


def test_lm_doc_scores_known_values_and_short_docs(spark):
    import math

    from lightlane_spark.operators.text import lm_doc_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "z"), (4, "")],
        "doc_id: bigint, text: string",
    )
    got = {r.doc_id: r.lm_score for r in lm_doc_scores(df).collect()}
    # vocab = {a, b, z} → V=3; unigrams: a=3, b=3, z=1
    # doc1 bigrams: (a b)×2, (b a)×1; c(a b)=3, c(b a)=1
    t_ab = round(-math.log((3 + 1) / (3 + 3)), 9)
    t_ba = round(-math.log((1 + 1) / (3 + 3)), 9)
    assert got[1] == round((2 * t_ab + t_ba) / 3, 6)
    assert got[2] == round(t_ab, 6)
    assert 3 not in got and 4 not in got  # <2 tokens → no bigrams


def test_cdc_chunks_shift_invariant(spark):
    """The CDC property fixed windows lack: prepending a paragraph
    leaves every later chunk's text unchanged (only indices shift)."""
    from lightlane_spark.operators.text import cdc_chunks

    body = " ".join("tok%d" % (i % 37) for i in range(300))
    df = spark.createDataFrame(
        [(1, body), (2, "new intro paragraph here " + body)],
        "doc_id: bigint, text: string",
    )
    out = cdc_chunks(df, mask_bits=4).collect()
    c1 = [r.chunk_text for r in sorted(out, key=lambda r: r.chunk_idx) if r.doc_id == 1]
    c2 = [r.chunk_text for r in sorted(out, key=lambda r: r.chunk_idx) if r.doc_id == 2]
    assert len(c1) > 3  # boundaries actually fired
    # all but doc2's first chunk(s) realign with doc1's chunks
    tail1, tail2 = c1[1:], c2[-(len(c1) - 1):]
    assert tail1 == tail2
    # reassembly is lossless
    assert " ".join(c1) == body


def test_temperature_mix_quotas_and_determinism(spark):
    from lightlane_spark.operators.text import temperature_mix_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id: bigint, source: string")
    out1 = temperature_mix_sample(df, "source", budget=100, temperature=0.5)
    got = out1.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in got}
    # sqrt weights: big=30, small=10 → quotas 75 / 25
    assert by_src == {"big": 75, "small": 25}
    # deterministic across invocations
    ids1 = sorted(r.doc_id for r in out1.collect())
    ids2 = sorted(
        r.doc_id
        for r in temperature_mix_sample(df, "source", 100, 0.5).collect()
    )
    assert ids1 == ids2
    # tau=1 keeps natural proportions
    nat = temperature_mix_sample(df, "source", budget=100, temperature=1.0)
    by_nat = {r.source: r["count"] for r in nat.groupBy("source").count().collect()}
    assert by_nat == {"big": 90, "small": 10}


def test_weighted_topk_sample_fixed_size_and_bias(spark):
    from pyspark.sql import functions as F

    from lightlane_spark.operators.text import weighted_topk_sample

    # 500 light rows (w=1) vs 500 heavy rows (w=50)
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, 1.0).otherwise(50.0).alias("w"),
    )
    out = weighted_topk_sample(df, "w", k=100)
    rows = out.collect()
    assert len(rows) == 100  # exactly k, always
    heavy = sum(1 for r in rows if r.w == 50.0)
    assert heavy > 80  # heavy rows dominate ~50:1 odds
    # deterministic
    again = weighted_topk_sample(df, "w", k=100).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)
    # zero/negative weights never sampled
    df2 = df.withColumn("w", F.when(F.col("doc_id") < 990, 0.0).otherwise(F.col("w")))
    out2 = weighted_topk_sample(df2, "w", k=100).collect()
    assert len(out2) == 10 and all(r.w > 0 for r in out2)


def _py_bpe(texts, rounds, min_len=2):
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if len(w) >= min_len:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    out = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, toks in vocab.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += words[w]
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        out.append((r, a, b, cnt))
        for w, toks in vocab.items():
            new, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            vocab[w] = new
    return out


def test_bpe_train_matches_python_model(spark):
    """Greedy-leftmost merge semantics incl. the overlapping-run case
    ('aaa' + merge(a,a) → [aa, a]) against a sequential reference."""
    from lightlane_spark.operators.text import bpe_train

    texts = ["aaa abab banana bandana", "the cat sat on the mat", "aaa aaa abab"]
    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    got = [(r["round"], r["a"], r["b"], r["cnt"]) for r in bpe_train(df, n_rounds=4).collect()]
    assert got == _py_bpe(texts, 4)


def test_bpe_train_merged_tokens_feed_next_round(spark):
    """After round 1 merges (a,a)→aa, round 2 must count pairs over
    the MERGED sequences (e.g. (aa,a) exists only post-merge)."""
    from lightlane_spark.operators.text import bpe_train

    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text: string")
    rows = bpe_train(df, n_rounds=2).collect()
    assert (rows[0]["a"], rows[0]["b"]) == ("a", "a")
    assert (rows[1]["a"], rows[1]["b"]) == ("aa", "aa")


def test_contaminated_ids_hashed_join_semantics(spark):
    """The token-wise-hash join must behave exactly like the gram-
    string semi-join: a corpus doc is flagged iff it shares a full
    word k-gram with ANY benchmark doc; shorter overlaps and docs
    with fewer than k tokens never match."""
    from lightlane_spark.operators.text import contaminated_ids

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id: bigint, text: string",
    )
    corpus = spark.createDataFrame(
        [
            # full 8-gram overlap (prefix of the benchmark doc)
            (1, "xxx the quick brown fox jumps over the lazy yyy"),
            # only a 7-gram overlap — below k, must NOT flag
            (2, "the quick brown fox jumps over the"),
            # no overlap at all
            (3, "completely different words in this document here now ok"),
            # shorter than k tokens
            (4, "tiny doc"),
        ],
        "doc_id: bigint, text: string",
    )
    got = sorted(r.doc_id for r in contaminated_ids(corpus, bench, k=8).collect())
    assert got == [1]


def test_dsir_log_weights_orders_by_target_similarity(spark):
    """DSIR importance log-weights must rank documents that share the
    target domain's n-grams above documents that don't, and the model
    must be scale-free in the doc count (weights depend only on the
    two fitted multinomials)."""
    import pyspark.sql.functions as F

    from lightlane_spark.operators.text import dsir_log_weights

    target_text = "spark shuffle partition exchange broadcast join"
    rows = [
        # the target domain (is_target = True)
        (1, target_text, "tgt"),
        (2, "spark shuffle partition broadcast exchange plan", "tgt"),
        # raw docs: one target-like, one alien
        (10, "spark shuffle partition exchange join plan", "raw"),
        (11, "banana apple orange kiwi mango papaya", "raw"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string, source: string")
    got = {
        r.doc_id: r.dsir_weight
        for r in dsir_log_weights(
            docs, target=F.col("source") == "tgt", dims=64
        ).collect()
    }
    assert set(got) == {1, 2, 10, 11}
    # target-like raw doc scores strictly higher than the alien doc
    assert got[10] > got[11]
    # deterministic: a second run yields identical values
    again = {
        r.doc_id: r.dsir_weight
        for r in dsir_log_weights(
            docs, target=F.col("source") == "tgt", dims=64
        ).collect()
    }
    assert got == again


def test_char_entropy_separates_uniform_from_degenerate(spark):
    """Symbol entropy: a single repeated character scores exactly 0,
    a near-uniform symbol string scores ~ln(alphabet), and natural
    text sits between; empty docs are absent."""
    import math

    from lightlane_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaaa"),
            (2, "abcdefghijklmnop"),  # 16 distinct chars, uniform
            (3, "the cat sat on the mat"),
            (4, ""),
        ],
        "doc_id: bigint, text: string",
    )
    rows = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert set(rows) == {1, 2, 3}  # empty doc absent
    assert rows[1].entropy == 0.0
    assert abs(rows[2].entropy - math.log(16)) < 1e-6
    assert 0.0 < rows[3].entropy < math.log(16)
    assert rows[2].n_chars == 16


def test_span_dedup_null_text_absent(spark):
    """ADVICE r7: a null-text doc must be ABSENT from span_dedup
    output (no token array → no spans → no totals row), not emitted
    as a spurious n_spans=0 row via size(NULL) = -1."""
    from lightlane_spark.operators.text import span_dedup

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, None)], "doc_id bigint, text string"
    )
    out = span_dedup(df, span=4).collect()
    assert [r.doc_id for r in out] == [1]


def test_h32_seeded_all_matches_per_seed_h32(spark):
    """h32_seeded_all(c, n) must equal [h32(c, seed=i) for i in 0..n)
    element-wise — the convenience array form may never drift from
    the per-seed primitive that every sketch oracle models."""
    from lightlane_spark.functions.hashing import h32, h32_seeded_all

    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("",)], "s string"
    ).select(
        h32_seeded_all("s", 4).alias("arr"),
        *[h32("s", seed=i).alias(f"h{i}") for i in range(4)],
    )
    for row in df.collect():
        assert list(row["arr"]) == [row[f"h{i}"] for i in range(4)]


def test_bit_of_portable_bit_extraction(spark):
    """bit_of(x, b) == (x >> b) & 1 for non-negative integers."""
    from lightlane_spark.functions.hashing import bit_of

    from pyspark.sql import functions as F

    vals = [0, 1, 2, 5, 1023, (1 << 31) - 1, 1 << 40]
    df = spark.createDataFrame([(v,) for v in vals], "x long").select(
        "x", *[bit_of(F.col("x"), b).alias(f"b{b}") for b in (0, 1, 5, 40)]
    )
    for row in df.collect():
        for b in (0, 1, 5, 40):
            assert row[f"b{b}"] == (row["x"] >> b) & 1, (row["x"], b)
