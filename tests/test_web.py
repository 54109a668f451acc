"""URL normalization rules + canonical dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightlane_spark.operators.web import normalize_url, url_dedup

CASES = [
    # scheme/host case + default port
    ("HTTPS://WWW.Example.COM:443/A/b", "https://www.example.com/A/b"),
    ("http://host.com:80/x", "http://host.com/x"),
    # non-default port kept
    ("http://host.com:8080/x", "http://host.com:8080/x"),
    # fragment dropped
    ("https://h.com/p#section", "https://h.com/p"),
    # tracking params stripped, others kept in order
    (
        "https://h.com/p?utm_source=a&id=3&utm_medium=b&q=2",
        "https://h.com/p?id=3&q=2",
    ),
    ("https://h.com/p?fbclid=xyz", "https://h.com/p"),
    ("https://h.com/p?gclid=1&ref=tw&keep=1", "https://h.com/p?keep=1"),
    # trailing slash off non-root; empty path → /
    ("https://h.com/dir/", "https://h.com/dir"),
    ("https://h.com", "https://h.com/"),
    ("https://h.com/", "https://h.com/"),
]


def test_normalize_url_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url: string")
    got = [r.n for r in df.select(normalize_url("url").alias("n")).collect()]
    assert got == [want for _, want in CASES]


def test_url_dedup_keeps_min_id_per_canonical(spark):
    rows = [
        (1, "https://A.com/x?utm_source=s"),
        (2, "https://a.com/x"),            # same canonical as 1
        (3, "https://a.com/x/"),           # same canonical as 1
        (4, "https://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, url: string")
    got = sorted(
        (r.doc_id, r.norm_url) for r in url_dedup(df).select("doc_id", "norm_url").collect()
    )
    assert got == [(1, "https://a.com/x"), (4, "https://a.com/y")]


def test_normalize_url_idempotent_on_generated_urls(spark):
    """normalize(normalize(u)) == normalize(u) — idempotence is what
    makes the canonical form safe as a dedup KEY (re-normalizing an
    already-canonical URL must not move it to a third form)."""
    from itertools import product

    schemes = ["http", "HTTPS"]
    hosts = ["Example.COM", "a.b.co:443", "x.io:8080"]
    paths = ["", "/", "/Dir/Page/", "/p"]
    queries = ["", "?utm_source=a", "?id=1&utm_medium=m&z=2", "?fbclid=f&gclid=g"]
    frags = ["", "#top"]
    urls = [
        f"{s}://{h}{p}{q}{f}"
        for s, h, p, q, f in product(schemes, hosts, paths, queries, frags)
    ]
    from pyspark.sql import functions as F

    from lightlane_spark.operators.web import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url: string")
    out = df.select(
        normalize_url("url").alias("n1"),
        normalize_url(normalize_url("url")).alias("n2"),
    )
    bad = out.where(F.col("n1") != F.col("n2")).collect()
    assert bad == [], bad[:5]
