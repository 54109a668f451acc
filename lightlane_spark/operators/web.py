"""Web-crawl curation: URL normalization + canonical-URL dedup.

Crawl corpora key everything by URL, and raw URLs are noisy: scheme
and host case, default ports, tracking params (utm_*, fbclid, gclid),
fragments, trailing slashes — the same page appears under dozens of
spellings, and URL-level dedup (the first, cheapest dedup stage in
CCNet/RefinedWeb-style pipelines, before any content hashing) only
works on a canonical form.

Everything here is map-only JVM expression work (``parse_url``,
``regexp_replace`` — whole-stage codegen, no Python), so at 100 TB
normalization is free relative to the scan, and the only shuffle is
the final keyed dedup. The reference (RickyXuPengfei/LightLane) has
no URL handling; this extends the curation surface the same way the
text operators do.

Normalization contract (deliberately conservative — reversible-risk
rewrites like path case-folding or param sorting are NOT applied):
  1. scheme and host lowercased;
  2. explicit default ports dropped (``:80`` http, ``:443`` https);
  3. fragment dropped;
  4. tracking params removed (``utm_*``, ``fbclid``, ``gclid``,
     ``ref``), other params kept in original order;
  5. trailing ``/`` dropped from non-root paths;
  6. empty path → ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def normalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module contract. Pure
    expression composition — usable inside any select/filter."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    # parse_url(HOST) excludes the port; grab it from AUTHORITY
    authority = F.parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.parse_url(u, F.lit("PATH"))
    path = F.when((path == "") | path.isNull(), F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.parse_url(u, F.lit("QUERY"))
    # strip tracking params, then tidy up leftover separators
    query = F.regexp_replace(query, TRACKING_PARAM_RE, "")
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"^&|&$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when((query != "") & query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id row per canonical URL (the crawl pipeline's
    stage-0 dedup): one shuffle keyed by the normalized URL."""
    from pyspark.sql import Window

    w = Window.partitionBy("__norm_url").orderBy(F.col(id_col))
    return (
        df.withColumn("__norm_url", normalize_url(url_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("__norm_url", "norm_url")
    )
