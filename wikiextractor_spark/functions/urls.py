"""URL and domain analysis for web corpora.

Crawled training data is curated per-domain (allowlists, per-domain
caps, boilerplate attribution), so "which domains does this corpus
cite/contain" is a first-class question.  All native: extraction is
``regexp_extract_all`` (one scan-speed pass), domain parsing is a
``parse_url``/``regexp`` composition, and corpus-level rollups
compose with :func:`~wikiextractor_spark.operators.sketches.heavy_hitters`
so the top-domain question never shuffles the full distinct-URL set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# precision-leaning: scheme-ful URLs only (bare "example.com" matches
# too much prose); trailing punctuation is trimmed separately so
# "see https://x.org/a." keeps the path but drops the period
URL_PATTERN = r"https?://[^\s<>\"')\]}]+"


def extract_urls(col: Column | str) -> Column:
    """→ ``array<string>`` of URLs in the text, trailing sentence
    punctuation stripped from each match."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.regexp_extract_all(c, F.lit(URL_PATTERN), 0),
        lambda u: F.regexp_replace(u, r"[.,;:!?]+$", ""),
    )


def url_domain(url: Column) -> Column:
    """Registrable host of a URL, lowercased, ``www.`` stripped
    (``parse_url`` is the JVM's own URL parser — no regex fragility
    for userinfo/ports/IPv6).  ``try_parse_url``: under Spark 4 ANSI
    the plain form THROWS on malformed matches (e.g. scheme-only
    ``https://``) instead of yielding NULL — a crawled corpus will
    contain those."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def doc_urls(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(id, url, domain)``: one row per URL occurrence.  Narrow
    (explode only); rows with no URLs drop out, as do matches whose
    HOST ``parse_url`` cannot parse (domain NULL) — filtering those
    HERE keeps every downstream rollup path consistent (the top-k
    heavy-hitter pass drops NULL keys; the exact path would otherwise
    emit a NULL-domain group the top-k path can never surface)."""
    return (
        df.select(F.col(id_col), F.explode(extract_urls(text_col)).alias("url"))
        .withColumn("domain", url_domain(F.col("url")))
        .filter(F.col("domain").isNotNull())
    )


def domain_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """→ ``(domain, n_urls, n_docs)`` per domain, most cited first.
    ``top_k`` bounds the result via the heavy-hitters two-pass (no
    full distinct-domain shuffle) and then attaches exact ``n_docs``
    for just those domains."""
    urls = doc_urls(df, text_col, id_col)
    if top_k is None:
        return (
            urls.groupBy("domain")
            .agg(
                F.count("*").alias("n_urls"),
                F.count_distinct(F.col(id_col)).alias("n_docs"),
            )
            .orderBy(F.desc("n_urls"), "domain")
        )
    from wikiextractor_spark.operators.sketches import heavy_hitters

    top = heavy_hitters(urls, "domain", k=top_k).select(
        F.col("value").alias("domain"), F.col("n").alias("n_urls")
    )
    per_doc = (
        urls.join(F.broadcast(top.select("domain")), "domain", "left_semi")
        .groupBy("domain")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    )
    return top.join(per_doc, "domain").orderBy(F.desc("n_urls"), "domain")
