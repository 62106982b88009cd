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
    # the trailing dot of an absolute FQDN ('example.com.') names the
    # same resource per DNS — strip it (ALL trailing dots, \.+$,
    # matching the blocklist-entry normalization in
    # filter_blocked_domains: with only \.$ here a 'host..' URL form
    # would normalize one dot short of its blocklist entry and leak),
    # or suffix/equality matching silently misses the dotted form
    return F.regexp_replace(host, r"^www\.|\.+$", "")


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


# --------------------------------------------------------------------------
# URL canonicalization (crawl-frontier / URL-grain dedup)
# --------------------------------------------------------------------------

# session/click identifiers that vary per visit without changing the
# resource — the standard strip set for crawl dedup.  Deliberately
# NOT included: bare ``ref`` — it is semantic on major hosts
# (GitHub/GitLab ``?ref=<branch>`` names a different resource), and a
# global strip would silently merge distinct documents; host-scoped
# strip lists handle it, a global one must not
TRACKING_PARAMS = (
    r"utm_[a-z]+|gclid|dclid|fbclid|msclkid|mc_cid|mc_eid|igshid|"
    r"ref_src|spm|yclid|_hsenc|_hsmi|vero_id|wickedid|oly_enc_id"
)


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for URL-grain dedup — the same page
    fetched through cosmetic variants must map to one key:

    * scheme and authority lowercased; the scheme's DEFAULT port
      (``:80`` http / ``:443`` https) dropped, any other port kept;
    * fragment dropped (client-side only — never a different fetch);
    * tracking parameters stripped (``utm_*``/click ids —
      ``TRACKING_PARAMS``), surviving query params SORTED (order is
      not semantic in practice and varies across link generators);
    * empty path normalized to ``/``; trailing slashes on a non-root
      path dropped (``/a/`` ≡ ``/a`` — the dominant server behavior;
      path case is preserved, paths ARE case-sensitive);
    * the host itself is otherwise untouched — ``www.`` is NOT
      stripped here (unlike the :func:`url_domain` rollup grain,
      ``www.x.org`` and ``x.org`` can serve different content) — and
      userinfo, when present, is kept verbatim (case-sensitive per
      RFC 3986; only host:port lowercases).

    Malformed URLs (``try_parse_url`` finds no scheme or host) →
    NULL, so dedup callers can keep-or-quarantine them explicitly.
    All native expressions — one codegen pass, no UDF."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    # AUTHORITY keeps the port (HOST does not).  Only host:port is
    # case-insensitive — userinfo is case-SENSITIVE per RFC 3986, so
    # it is split off verbatim and only the remainder lowercased
    raw_auth = F.try_parse_url(url, F.lit("AUTHORITY"))
    userinfo = F.regexp_extract(raw_auth, r"^(.*@)", 1)
    auth = F.concat(userinfo, F.lower(F.regexp_replace(raw_auth, r"^.*@", "")))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    kept_params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike(f"(?i)^({TRACKING_PARAMS})="),
        )
    )
    query_part = F.when(
        F.size(kept_params) > 0,
        F.concat(F.lit("?"), F.concat_ws("&", kept_params)),
    ).otherwise(F.lit(""))
    host = F.try_parse_url(url, F.lit("HOST"))
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(scheme, F.lit("://"), auth, path, query_part),
    )


def dedup_by_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
    keep_unparseable: bool = True,
) -> DataFrame:
    """Keep ONE row per :func:`canonical_url` key — crawl-frontier
    dedup (the same page fetched via http/https, with tracking
    params, with a fragment, with a trailing slash, is one fetch).
    Survivor = smallest ``id_col`` per key, deterministically.

    Rows whose URL does not canonicalize (no scheme/host) have no
    key; by default they all pass through (stated — a NULL-keyed
    groupBy would silently collapse them to one row), and
    ``keep_unparseable=False`` drops them instead.

    One shuffle on the canonical key; everything else narrow.  The
    passthrough is a surrogate-key branch of the SAME pass, not a
    second scan: each unparseable row windows under its own unique
    ``\\x00<row-id>`` key (no canonical URL can start with ``\\x00``
    — they all start with a scheme; per-ROW uniqueness, so duplicate
    or NULL ids cannot collapse unparseable rows), and the input is
    read and canonicalized exactly once either way."""
    from pyspark.sql import Window

    keyed = df.withColumn("_ck", canonical_url(F.col(url_col)))
    if not keep_unparseable:
        keyed = keyed.filter(F.col("_ck").isNotNull())
    else:
        # surrogate uniqueness must not depend on the id column:
        # duplicate or NULL ids would collapse unparseable rows into
        # one window group and silently drop all but one, breaking
        # the pass-through contract.  monotonically_increasing_id is
        # unique per row; nondeterminism across runs is fine — every
        # unparseable row keeps rank 1 in its singleton group either
        # way, so the OUTPUT set is deterministic.
        keyed = keyed.withColumn(
            "_ck",
            F.coalesce(
                F.col("_ck"),
                F.concat(
                    F.lit("\x00"),
                    F.monotonically_increasing_id().cast("string"),
                ),
            ),
        )
    w = Window.partitionBy("_ck").orderBy(F.asc(id_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_ck")
    )


def host_suffixes(url: Column) -> Column:
    """All dot-suffixes of a URL's host, most-specific first —
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com,
    example.com, com]`` — so blocklist matching is an equi-join on
    an exploded bounded array (hosts have ≤ ~10 labels) instead of
    an unjoinable ``endswith`` predicate.  NULL/unparseable URLs
    yield NULL."""
    host = url_domain(url)
    # let-bind the label array once (the repo's transform(array(...))
    # idiom): without it the parse_url+split chain re-evaluates per
    # reference
    return F.transform(
        F.array(F.split(host, r"\.")),
        lambda ps: F.transform(
            F.sequence(F.lit(1), F.size(ps)),
            lambda i: F.array_join(F.slice(ps, i, F.size(ps) - i + 1), "."),
        ),
    ).getItem(0)


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame | list[str],
    url_col: str = "url",
    id_col: str = "doc_id",
    keep_unparseable: bool = True,
) -> DataFrame:
    """Drop rows whose URL's host is a blocked domain OR any
    subdomain of one — the C4/RefinedWeb curated-blocklist gate.

    Scale shape: each row explodes its ≤ ~10 host suffixes once and
    semi-joins the BROADCAST blocklist on exact suffix equality (a
    curated list is driver-sized by construction), yielding the
    blocked id set; the corpus then anti-joins that id set.  The
    corpus itself never shuffles on a derived key — only (id,
    suffix) pairs enter the probe, and the blocked-id side is
    usually a sliver.

    ``blocklist`` entries are bare lowercase domains
    (``example.com``); leading ``www.`` and dots are normalized away
    exactly like :func:`url_domain` normalizes hosts (a curated list
    full of ``www.``-prefixed entries would otherwise be silently
    inert).  A DataFrame blocklist must have a single ``domain``
    string column and gets the same normalization.

    Semantics are ID-GRAIN for non-NULL ids: an id with ANY blocked
    URL is dropped in full (taint semantics — under duplicate ids,
    every row of a blocked id goes).  Rows with a NULL id are gated
    at the ROW grain through a separate packed-row pass over that
    sliver, so NULL-id blocked rows cannot leak through the id join.
    Rows whose URL has no parseable host match nothing; by default
    they pass through, ``keep_unparseable=False`` drops them
    (stated, like :func:`dedup_by_url`)."""
    # chained, not one alternation: with r'^\.+|^www\.|\.$' in a
    # single regexp_replace the leading-dot match consumes position 0
    # and the anchored ^www\. can never fire afterwards, so an entry
    # like '.www.example.com' would normalize to 'www.example.com'
    # and silently never match (url_domain strips www.)
    # trailing strip is \.+$ to mirror the leading \.+ rule AND
    # url_domain's host normalization — with a single \.$ an entry
    # like 'bad.com..' would normalize to 'bad.com.' and silently
    # never match any host
    norm = lambda c: F.regexp_replace(  # noqa: E731 — mirrors url_domain
        F.regexp_replace(
            F.regexp_replace(F.lower(F.trim(c)), r"^\.+", ""),
            r"^www\.", "",
        ),
        r"\.+$", "",
    )
    if isinstance(blocklist, list):
        from wikiextractor_spark.localframe import local_rows_df

        bl = local_rows_df(
            df.sparkSession, [(d,) for d in blocklist], "domain string"
        )
    else:
        if blocklist.columns != ["domain"]:
            raise ValueError(
                "blocklist DataFrame must have exactly one 'domain' "
                f"column, got {blocklist.columns}"
            )
        bl = blocklist
    bl = bl.select(norm(F.col("domain")).alias("domain"))

    main = df.filter(F.col(id_col).isNotNull())
    blocked_ids = (
        main.select(
            F.col(id_col),
            F.explode(host_suffixes(F.col(url_col))).alias("domain"),
        )
        .join(F.broadcast(bl), "domain", "left_semi")
        .select(id_col)
        .distinct()
    )
    out = main.join(blocked_ids, id_col, "left_anti")

    nulls = df.filter(F.col(id_col).isNull())
    # row-grain path for the NULL-id sliver: the whole row rides a
    # struct through one LINEAR explode → broadcast join → regroup
    # plan keyed by a per-row surrogate (assigned once, upstream of
    # the shuffle — no branch reuse, so recompute determinism is the
    # same contract dedup_by_url's surrogate relies on)
    # the surrogate MUST be projected BEFORE the explode: evaluated in
    # the same select as the generator it runs once per exploded
    # output row (each suffix gets its own id) and the regroup never
    # reassembles the document
    packed = nulls.select(
        F.struct(*nulls.columns).alias("_row"),
        F.monotonically_increasing_id().alias("_rid"),
        host_suffixes(F.col(url_col)).alias("_sfx"),
    ).select("_row", "_rid", F.explode_outer("_sfx").alias("domain"))
    kept_nulls = (
        packed.join(
            F.broadcast(bl.withColumn("_hit", F.lit(1))), "domain", "left"
        )
        .groupBy("_rid")
        .agg(
            F.any_value(F.col("_row")).alias("_row"),
            F.max(F.coalesce(F.col("_hit"), F.lit(0))).alias("_b"),
        )
        .filter(F.col("_b") == 0)
        .select("_row.*")
    )
    out = out.unionByName(kept_nulls)
    if not keep_unparseable:
        out = out.filter(url_domain(F.col(url_col)).isNotNull())
    return out
