"""Repetition signals + PII redaction: naive-Python differentials and
planted-example pins."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.functions.pii import (
    PII_PATTERNS,
    has_pii,
    pii_counts,
    redact_pii,
)
from wikiextractor_spark.functions.repetition import (
    dup_line_char_fraction,
    dup_line_fraction,
    dup_ngram_fraction,
    is_repetitive,
    repetition_signals,
    top_ngram_fraction,
)

# ---------------------------------------------------------------- repetition

REP_DOCS = [
    (1, "alpha beta gamma\ndelta epsilon\nzeta eta theta"),          # clean
    (2, "nav home about contact\nreal content sentence with quite a few more "
        "unique words inside\nnav home about contact\nnav home about contact"),  # dup lines
    (3, "buy now " * 20),                                             # one phrase
    (4, ""),                                                          # empty
    (5, "only one line here"),
    (6, "a b c d e f g h i j a b c d e f g h i j unique tail words"),  # dup grams
]


def _lines(t: str) -> list[str]:
    return [l.strip() for l in t.split("\n") if l.strip()]


def _grams(t: str, n: int) -> list[str]:
    ws = [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ") if w]
    if not ws:
        return []
    if len(ws) < n:
        return [" ".join(ws)]
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def _naive(t: str) -> dict[str, float]:
    ls = _lines(t)
    out = {}
    out["dup_line_frac"] = (len(ls) - len(set(ls))) / len(ls) if ls else 0.0
    if ls:
        dup_chars = sum(len(l) for l in ls if ls.count(l) > 1)
        out["dup_line_char_frac"] = dup_chars / sum(len(l) for l in ls)
    else:
        out["dup_line_char_frac"] = 0.0
    for n, key in [(2, "top_2gram_frac"), (3, "top_3gram_frac")]:
        gs = _grams(t, n)
        out[key] = max(gs.count(g) for g in set(gs)) / len(gs) if gs else 0.0
    gs = _grams(t, 5)
    out["dup_5gram_frac"] = (
        sum(1 for g in gs if gs.count(g) > 1) / len(gs) if gs else 0.0
    )
    return out


@pytest.fixture(scope="module")
def rep_df(spark):
    return spark.createDataFrame(REP_DOCS, "doc_id long, text string")


def test_repetition_signals_match_naive(rep_df):
    rows = rep_df.select(
        "doc_id", "text", repetition_signals("text").alias("s")
    ).collect()
    for r in rows:
        want = _naive(r.text)
        got = r.s.asDict()
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-9), (r.doc_id, k, got[k], v)


def test_repetition_extremes(rep_df):
    got = {
        r.doc_id: r.s.asDict()
        for r in rep_df.select("doc_id", repetition_signals("text").alias("s")).collect()
    }
    assert got[1]["dup_line_frac"] == 0.0
    assert got[2]["dup_line_frac"] == pytest.approx(0.5)  # 2 repeats among 4 lines
    assert got[3]["top_2gram_frac"] > 0.4                  # phrase-stuffed
    assert got[4] == {k: 0.0 for k in got[4]}              # empty doc all zero
    assert got[6]["dup_5gram_frac"] > 0.5


def test_is_repetitive_gate(rep_df):
    flagged = {
        r.doc_id for r in rep_df.filter(is_repetitive("text")).collect()
    }
    assert {2, 3, 6} <= flagged
    assert 1 not in flagged and 5 not in flagged


def test_individual_functions_consistent_with_struct(rep_df):
    row = (
        rep_df.filter("doc_id = 2")
        .select(
            dup_line_fraction("text").alias("a"),
            dup_line_char_fraction("text").alias("b"),
            top_ngram_fraction("text", 2).alias("c"),
            dup_ngram_fraction("text", 5).alias("d"),
            repetition_signals("text").alias("s"),
        )
        .collect()[0]
    )
    assert row.a == row.s.dup_line_frac
    assert row.b == row.s.dup_line_char_frac
    assert row.c == row.s.top_2gram_frac
    assert row.d == row.s.dup_5gram_frac


def test_ngram_validation(rep_df):
    with pytest.raises(ValueError):
        top_ngram_fraction("text", 0)
    with pytest.raises(ValueError):
        dup_ngram_fraction("text", 0)


# ----------------------------------------------------------------------- PII

PII_DOCS = [
    (1, "contact alice.smith+tag@example.co.uk for details", {"email": 1}),
    (2, "server at 192.168.0.1 and 10.0.0.255 responded", {"ipv4": 2}),
    (3, "ssn 123-45-6789 on file", {"ssn": 1}),
    (4, "call (555) 123-4567 or 555.987.6543 today", {"phone": 2}),
    (5, "version 1.2.3.4.5 and 999.999.1.1 are not addresses", {}),
    (6, "clean text with numbers 12345 and words only", {}),
    (7, "mail a@b.io, ip 8.8.8.8, call +1 212 555 0199", {"email": 1, "ipv4": 1, "phone": 1}),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in PII_DOCS], "doc_id long, text string"
    )


def test_pii_counts(pii_df):
    got = {
        r.doc_id: {k: v for k, v in r.c.asDict().items() if v}
        for r in pii_df.select("doc_id", pii_counts("text").alias("c")).collect()
    }
    for doc_id, _, want in PII_DOCS:
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_redaction_removes_all_pii(pii_df):
    red = pii_df.select(
        "doc_id", redact_pii("text").alias("text")
    )
    # post-redaction, every detector reports zero
    leftover = red.select(pii_counts("text").alias("c")).collect()
    for r in leftover:
        assert all(v == 0 for v in r.c.asDict().values()), r
    # placeholders present where PII was
    texts = {r.doc_id: r.text for r in red.collect()}
    assert "<EMAIL>" in texts[1] and "alice" not in texts[1]
    assert texts[2].count("<IP>") == 2
    assert "<ID>" in texts[3]
    assert texts[4].count("<PHONE>") == 2
    # clean docs untouched
    orig = {i: t for i, t, _ in PII_DOCS}
    assert texts[5] == orig[5] and texts[6] == orig[6]


def test_has_pii_matches_counts(pii_df):
    rows = pii_df.select(
        "doc_id", has_pii("text").alias("h"), pii_counts("text").alias("c")
    ).collect()
    for r in rows:
        assert r.h == (sum(r.c.asDict().values()) > 0)


def test_selective_kinds(pii_df):
    red = {
        r.doc_id: r.t
        for r in pii_df.select(
            "doc_id", redact_pii("text", kinds=("email",)).alias("t")
        ).collect()
    }
    assert "<EMAIL>" in red[1]
    assert "192.168.0.1" in red[2]  # ipv4 untouched when not requested


def test_patterns_compile_in_python_too():
    # patterns stay portable (documented Java/Python divergence aside)
    for kind, (p, _) in PII_PATTERNS.items():
        re.compile(p)


# ------------------------------------------------------- rolling fingerprint


def test_rolling_fingerprint(spark):
    from wikiextractor_spark.functions.textstats import (
        ROLLING_FP_MOD,
        rolling_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "world hello"), (3, "hello world"),
         (4, "Hello   WORLD"), (5, "")],
        "id long, text string",
    )
    h = {
        r.id: r.h
        for r in df.select("id", rolling_fingerprint(F.col("text")).alias("h")).collect()
    }
    # normalization (case + whitespace) and order sensitivity
    assert h[1] == h[3] == h[4]
    assert h[1] != h[2]
    # all values inside the modulus
    assert all(0 <= v < ROLLING_FP_MOD for v in h.values())
    # composability: h(a ++ b) = (h(a) * base^|b| + h(b)) mod M —
    # the identity that lets shard fingerprints combine in a
    # tree-reduction without re-reading text
    a, b = "quick brown fox", "jumps over lazy dogs"
    full, ha, hb = [
        r.h
        for r in spark.createDataFrame([(f"{a} {b}",), (a,), (b,)], "text string")
        .select(rolling_fingerprint(F.col("text")).alias("h"))
        .collect()
    ]
    assert (ha * pow(1_000_003, 4, ROLLING_FP_MOD) + hb) % ROLLING_FP_MOD == full


# ------------------------------------------------------------ URL / domains


URL_DOCS = [
    (1, "see https://example.com/page. and http://www.Example.com/other?q=1,"),
    (2, "nothing here"),
    (3, "links https://a.org/x https://a.org/y (https://b.net/z)"),
    (4, "with port http://user@sub.example.com:8080/p!"),
    # regex-matched but hostless: parse_url HOST is NULL — must drop
    # from doc_urls so exact and top-k rollups agree (r3 ADVICE)
    (5, "broken https://. scheme only"),
]


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame(URL_DOCS, "doc_id long, text string")


def test_extract_urls(url_df):
    from wikiextractor_spark.functions.urls import extract_urls

    got = {
        r.doc_id: r.u
        for r in url_df.select("doc_id", extract_urls("text").alias("u")).collect()
    }
    # trailing sentence punctuation trimmed; query strings kept
    assert got[1] == ["https://example.com/page", "http://www.Example.com/other?q=1"]
    assert got[2] == []
    assert len(got[3]) == 3 and got[3][2] == "https://b.net/z"
    assert got[4] == ["http://user@sub.example.com:8080/p"]


def test_doc_urls_domains(url_df):
    from wikiextractor_spark.functions.urls import doc_urls

    got = {(r.doc_id, r.domain) for r in doc_urls(url_df).collect()}
    # lowercased, www-stripped, port/userinfo handled by parse_url
    assert got == {
        (1, "example.com"), (3, "a.org"), (3, "b.net"), (4, "sub.example.com"),
    }


def test_domain_counts_full_and_topk_agree(url_df):
    from wikiextractor_spark.functions.urls import domain_counts

    full = [(r.domain, r.n_urls, r.n_docs) for r in domain_counts(url_df).collect()]
    assert full[0] == ("a.org", 2, 1) and ("example.com", 2, 1) in full[:2]
    top = [(r.domain, r.n_urls, r.n_docs) for r in domain_counts(url_df, top_k=2).collect()]
    assert top == full[:2]
    # the planted hostless URL (doc 5) must not create a NULL-domain
    # group on EITHER path
    assert all(d is not None for d, _, _ in full)


def test_unigram_lm_fit_and_score(spark):
    """Corpus-LM quality: the fitted unigram model matches exact
    counts (DuckDB twin), common-word docs outscore gibberish, OOV
    tokens take the floor, and the gate keeps exactly the docs at or
    above the threshold."""
    import math

    import duckdb

    from wikiextractor_spark.functions.lmquality import (
        doc_logprob_scores,
        filter_by_logprob,
        fit_unigram_lm,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "the the the the"),
            (4, "zyxwvut qponmlk jihgfed"),  # pure OOV gibberish
        ],
        "doc_id long, text string",
    )
    lm = fit_unigram_lm(docs, vocab_size=100)
    got = {
        r["token"]: r["logp"]
        for r in lm.filter("token IS NOT NULL").collect()
    }
    # DuckDB twin of the fit
    con = duckdb.connect()
    rows = con.execute(
        """
        WITH t AS (
          SELECT unnest(string_split(lower(text), ' ')) AS token
          FROM (VALUES ('the cat sat on the mat'), ('the dog sat on the log'),
                       ('the the the the'), ('zyxwvut qponmlk jihgfed')) v(text)
        )
        SELECT token, ln(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM t)) AS logp
        FROM t GROUP BY token
        """
    ).fetchall()
    want = {t: lp for t, lp in rows}
    assert set(got) == set(want)
    for t in got:
        assert abs(got[t] - want[t]) < 1e-9, t

    scores = {
        r["doc_id"]: (r["n_tokens"], r["mean_logp"])
        for r in doc_logprob_scores(docs, lm).collect()
    }
    assert scores[1][0] == 6 and scores[4][0] == 3
    # the all-'the' doc has the highest mean logp; gibberish the lowest
    assert scores[3][1] > scores[1][1] > scores[4][1]
    # OOV floor: every gibberish token is out of vocab... but with
    # vocab_size=100 nothing is OOV here, so refit with a tiny vocab
    lm_small = fit_unigram_lm(docs, vocab_size=1)  # only 'the' kept
    total = 6 + 6 + 4 + 3  # tokens across the corpus
    floor = math.log(0.5 / total)
    s4 = {
        r["doc_id"]: r["mean_logp"]
        for r in doc_logprob_scores(docs, lm_small).collect()
    }
    assert abs(s4[4] - floor) < 1e-9  # all-OOV doc sits exactly at it

    # docs 1 and 2 are frequency-symmetric (cat/mat vs dog/log all
    # singletons) so both sit exactly at the threshold
    kept = filter_by_logprob(docs, lm, min_mean_logp=scores[1][1] - 1e-9)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3}

    # scoring under a model FIT ON ANOTHER CORPUS (the reuse contract)
    ref = spark.createDataFrame(
        [(10, "completely different reference vocabulary here")],
        "doc_id long, text string",
    )
    lm_ref = fit_unigram_lm(ref, vocab_size=100)
    cross = doc_logprob_scores(docs, lm_ref).collect()
    assert len(cross) == 4  # every doc scores, all tokens at the floor


def test_unigram_lm_plan_no_token_shuffle(spark):
    """The scoring join must broadcast the vocab — the corpus side
    never shuffles on tokens."""
    import contextlib
    import io

    from wikiextractor_spark.functions.lmquality import (
        doc_logprob_scores,
        fit_unigram_lm,
    )

    docs = spark.createDataFrame(
        [(i, f"some words number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    lm = fit_unigram_lm(docs, vocab_size=50)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        doc_logprob_scores(docs, lm).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filter_by_logprob_tokenless_docs(spark):
    """Zero-token docs have no score: dropped by default (stated
    behavior), passed through with keep_tokenless=True."""
    from wikiextractor_spark.functions.lmquality import (
        filter_by_logprob,
        fit_unigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "real words in here"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    lm = fit_unigram_lm(docs.filter("doc_id = 1"), vocab_size=10)
    dropped = filter_by_logprob(docs, lm, min_mean_logp=-1e9)
    assert {r["doc_id"] for r in dropped.collect()} == {1}
    kept = filter_by_logprob(docs, lm, min_mean_logp=-1e9, keep_tokenless=True)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3}


def test_canonical_url_and_dedup(spark):
    """canonical_url maps cosmetic fetch variants to one key (scheme/
    authority case, default ports, fragments, tracking params, param
    order, trailing slashes) while preserving semantic differences
    (non-default ports, path case, www, real params); dedup_by_url
    keeps the smallest id per key and passes unparseable rows
    through."""
    from wikiextractor_spark.functions.urls import canonical_url, dedup_by_url

    pairs = [
        # variants of ONE canonical form
        ("HTTPS://Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
         "https://example.com/a/b?a=1&b=2"),
        ("https://example.com/a/b?b=2&a=1", "https://example.com/a/b?a=1&b=2"),
        ("http://example.com:80", "http://example.com/"),
        ("http://example.com", "http://example.com/"),
        ("https://example.com/?gclid=abc&fbclid=z", "https://example.com/"),
        # semantic differences preserved
        ("http://example.com:8080/a/", "http://example.com:8080/a"),
        ("https://www.example.com/Path/", "https://www.example.com/Path"),
        ("https://example.com/path", "https://example.com/path"),
        ("https://example.com/PATH", "https://example.com/PATH"),
        # bare ?ref= is semantic (GitHub-style branch refs) — kept
        ("https://host.org/api/file?ref=main", "https://host.org/api/file?ref=main"),
        # userinfo is case-sensitive — verbatim; host still lowercases
        ("https://UserA@Example.COM/x", "https://UserA@example.com/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in pairs], "u string")
    got = [
        r["c"]
        for r in df.select(canonical_url(F.col("u")).alias("c")).collect()
    ]
    assert got == [want for _, want in pairs]
    # malformed: NULL key
    bad = spark.createDataFrame([("nope",), ("https://",)], "u string")
    assert [
        r["c"] for r in bad.select(canonical_url(F.col("u")).alias("c")).collect()
    ] == [None, None]

    docs = spark.createDataFrame(
        [
            (1, "https://example.com/a/b?b=2&a=1"),
            (2, "HTTPS://Example.COM:443/a/b/?utm_source=x&a=1&b=2"),
            (3, "http://example.com"),
            (4, "http://example.com:80/"),
            (5, "not a url"),
            (6, "also not one"),
            # unparseable rows with DUPLICATE ids: pass-through must be
            # per ROW (a surrogate keyed on the id would collapse them)
            (7, "junk one"),
            (7, "junk two"),
        ],
        "doc_id long, url string",
    )
    kept = dedup_by_url(docs).collect()
    assert {r["doc_id"] for r in kept} == {1, 3, 5, 6, 7}
    assert len([r for r in kept if r["doc_id"] == 7]) == 2
    dropped = {r["doc_id"] for r in dedup_by_url(docs, keep_unparseable=False).collect()}
    assert dropped == {1, 3}


# ---------------------- Gopher shape rules (A1.1) ----------------------


def test_gopher_signals_and_gate(spark):
    from wikiextractor_spark.functions.gopher import (
        gopher_signals,
        passes_gopher_rules,
    )

    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with energy "
         "and grace to be of note have"] * 5
    )
    rows = [
        (1, good),
        (2, "short doc"),                       # word-count floor
        (3, " ".join(["#tag"] * 60)),           # symbol ratio + stopword floor
        (4, "\n".join(["• item of the list to be"] * 30) + "\n" + good),
        (5, " ".join(["123456"] * 80)),         # alpha-word floor
        (6, None),                              # NULL text fails
        (7, good + " " + " ".join(["end of line..."] * 0)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in df.filter(passes_gopher_rules()).collect()}
    assert kept == {1, 7}

    s = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", gopher_signals().alias("s")).collect()}
    assert s[1]["stop_hits"] == 8 and s[1]["alpha_word_frac"] == 1.0
    assert s[3]["symbol_word_ratio"] == 1.0
    assert s[4]["bullet_line_frac"] > 0.9
    assert s[5]["alpha_word_frac"] == 0.0


def test_gopher_ellipsis_and_thresholds(spark):
    from wikiextractor_spark.functions.gopher import passes_gopher_rules

    base = ("the cat and the dog have gone to be of use with that "
            "group and more words follow here now then")
    many_ellipsis = "\n".join([base + "..."] * 10)
    df = spark.createDataFrame(
        [(1, many_ellipsis)], "doc_id long, text string"
    )
    # every line ends with '...' -> fails the default 0.3 cap...
    assert df.filter(passes_gopher_rules(min_words=10)).count() == 0
    # ...but passes with the cap lifted
    assert df.filter(
        passes_gopher_rules(min_words=10, max_ellipsis_line_frac=1.0)
    ).count() == 1


def test_gopher_gate_is_narrow_plan(spark, sf_dir):
    from wikiextractor_spark.functions.gopher import passes_gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = docs.filter(passes_gopher_rules())._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------- domain blocklist gate ----------------------


def test_host_suffixes(spark):
    from wikiextractor_spark.functions.urls import host_suffixes

    df = spark.createDataFrame(
        [(1, "https://a.b.example.com/p?q=1"),
         (2, "https://www.example.org/"),
         (3, "not a url"),
         (4, None)],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", host_suffixes(F.col("url")).alias("s")).collect()}
    assert got[1] == ["a.b.example.com", "b.example.com", "example.com", "com"]
    assert got[2] == ["example.org", "org"]  # www. stripped
    assert got[3] is None and got[4] is None


def test_filter_blocked_domains(spark):
    from wikiextractor_spark.functions.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [(1, "https://spam.example.com/page"),   # subdomain of blocked
         (2, "https://example.com/x"),           # exactly blocked
         (3, "https://example.com.evil.net/y"),  # NOT blocked (suffix only)
         (4, "https://clean.org/z"),
         (5, "garbage"),                         # unparseable
         (6, None)],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in
            filter_blocked_domains(df, ["example.com"]).collect()}
    assert kept == {3, 4, 5, 6}
    # unparseable rows droppable on request
    kept2 = {r["doc_id"] for r in filter_blocked_domains(
        df, ["example.com"], keep_unparseable=False).collect()}
    assert kept2 == {3, 4}

    # normalizations must COMPOSE: a leading dot before 'www.' used
    # to consume position 0 in a single-alternation regexp_replace,
    # leaving 'www.example.com' — which matches no host (url_domain
    # strips www.) — a silently-inert blocklist entry
    kept3 = {r["doc_id"] for r in
             filter_blocked_domains(df, [".www.example.com."]).collect()}
    assert kept3 == {3, 4, 5, 6}

    # DataFrame blocklist + validation
    bl = spark.createDataFrame([("clean.org",)], "domain string")
    assert {r["doc_id"] for r in
            filter_blocked_domains(df, bl).collect()} == {1, 2, 3, 5, 6}
    with pytest.raises(ValueError, match="domain"):
        filter_blocked_domains(df, df)


def test_filter_blocked_domains_plan_broadcasts(spark):
    from wikiextractor_spark.functions.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [(i, f"https://site{i}.com/") for i in range(100)],
        "doc_id long, url string",
    )
    plan = filter_blocked_domains(df, ["bad.com"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_blocked_domains_null_and_duplicate_ids(spark):
    """NULL-id rows gate at the ROW grain (blocked ones cannot leak
    through the id join); duplicate non-NULL ids use taint
    semantics — every row of a blocked id drops."""
    from wikiextractor_spark.functions.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [(1, "https://ok.org/a"),
         (None, "https://spam.bad.net/x"),     # NULL id + blocked -> drop
         (None, "https://fine.org/y"),          # NULL id + clean  -> keep
         (5, "https://bad.net/y"),              # tainted id...
         (5, "https://fine.org/z")],            # ...drops both rows
        "doc_id long, url string",
    )
    kept = [(r["doc_id"], r["url"]) for r in
            filter_blocked_domains(df, ["bad.net"]).collect()]
    assert sorted(kept, key=str) == sorted(
        [(1, "https://ok.org/a"), (None, "https://fine.org/y")], key=str)


def test_filter_blocked_domains_normalizes_entries_and_fqdn(spark):
    """'www.'-prefixed blocklist entries and trailing-dot FQDN hosts
    must both match (either would silently leak otherwise)."""
    from wikiextractor_spark.functions.urls import (
        filter_blocked_domains,
        host_suffixes,
    )

    df = spark.createDataFrame(
        [(1, "https://spam.bad.net./x"),       # absolute FQDN form
         (2, "https://www.bad.net/y"),
         (3, "https://clean.org/z")],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in
            filter_blocked_domains(df, ["www.bad.net"]).collect()}
    assert kept == {3}
    sfx = df.filter("doc_id = 1").select(
        host_suffixes(F.col("url")).alias("s")).first()["s"]
    assert sfx == ["spam.bad.net", "bad.net", "net"]  # no '' garbage entry


def test_gopher_crlf_lines(spark):
    """CRLF documents: the ellipsis-line rule must see the '...'
    (trim() alone would leave a trailing \\r and never match)."""
    from wikiextractor_spark.functions.gopher import gopher_signals

    base = "the cat and the dog have gone to be of use with that group"
    crlf = "\r\n".join([base + "..."] * 10)
    lf = "\n".join([base + "..."] * 10)
    got = {r["doc_id"]: r["s"]["ellipsis_line_frac"] for r in
           spark.createDataFrame([(1, crlf), (2, lf)],
                                 "doc_id long, text string")
           .select("doc_id", gopher_signals().alias("s")).collect()}
    assert got[1] == got[2] == 1.0


def test_repetition_crlf_matches_naive(spark):
    """The shared line split is CRLF-aware, keeping the SQL signals
    equal to the naive differential (whose strip() removes \\r)."""
    t = "nav home\r\nreal content here\r\nnav home\r\nnav home"
    got = (spark.createDataFrame([(1, t)], "doc_id long, text string")
           .select(repetition_signals("text").alias("s")).first()["s"])
    want = _naive(t)
    assert got["dup_line_frac"] == pytest.approx(want["dup_line_frac"])
    assert got["dup_line_char_frac"] == pytest.approx(
        want["dup_line_char_frac"])


def test_perplexity_buckets_plan_no_global_sort(spark):
    """Bucketing must come from quantile THRESHOLDS (two driver
    floats), never a global sort/ntile — the property that keeps it
    viable at corpus scale."""
    from wikiextractor_spark.functions.lmquality import (
        fit_unigram_lm,
        perplexity_buckets,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i} common text here") for i in range(50)],
        "doc_id long, text string",
    )
    lm = fit_unigram_lm(docs, vocab_size=50)
    plan = perplexity_buckets(docs, lm)._jdf.queryExecution(
    ).executedPlan().toString()
    # per-partition SMJ sorts ("... false, 0") are fine; a GLOBAL
    # sort ("... true, 0") or any Window would be the ntile shape
    assert "true, 0" not in plan
    assert "Window" not in plan


def test_gates_robust_on_adversarial_text(spark):
    """One batch of adversarial documents (regex metachars, CJK,
    emoji, RTL, control chars, huge tokens, mixed newlines, NULL)
    through every new gate expression: nothing raises, every signal
    lands in its contract range, the boolean gates stay boolean."""
    from wikiextractor_spark.functions.classifier import (
        DEFAULT_MODEL,
        logit_expr,
    )
    from wikiextractor_spark.functions.gopher import (
        gopher_signals,
        passes_gopher_rules,
    )
    from wikiextractor_spark.functions.urls import host_suffixes

    adversarial = [
        "a]b[c(d)e{f}g|h\\i^j$k.l*m+n?o",     # regex metachars
        "中文文本没有空格也没有英文字母",          # CJK, no spaces
        "🎉🎊💥 emoji only 🚀🌟",
        "مرحبا بالعالم هذا نص عربي",            # RTL
        "line1\rline2\r\nline3\nline4",        # mixed newlines
        "\t\t\v\f      ",       # exotic whitespace
        "x" * 50_000,                          # one huge token
        ("tok " * 20_000).strip(),             # many tokens
        "\x00\x01\x02 control \x1f chars",
        "'); DROP TABLE docs; --",             # quote-ish content
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t, f"https://h{i}.example/{t[:5] if t else ''}")
         for i, t in enumerate(adversarial)],
        "doc_id long, text string, url string",
    )
    rows = df.select(
        "doc_id",
        gopher_signals().alias("s"),
        passes_gopher_rules().alias("keep"),
        logit_expr(DEFAULT_MODEL).alias("z"),
        host_suffixes(F.col("url")).alias("sfx"),
    ).collect()
    assert len(rows) == len(adversarial)
    for r in rows:
        if r["s"] is not None and r["s"]["n_words"] is not None:
            s = r["s"]
            assert s["n_words"] >= 0
            for frac in ("bullet_line_frac", "ellipsis_line_frac",
                         "alpha_word_frac"):
                assert s[frac] is None or 0.0 <= s[frac] <= 1.0
            assert s["stop_hits"] is not None and 0 <= s["stop_hits"] <= 8
        assert r["keep"] in (True, False, None)
        if r["z"] is not None:
            import math as _m
            assert _m.isfinite(r["z"])


# --------------------------- interpolated bigram LM ---------------------------


def test_bigram_lm_prices_word_order(spark):
    """The bigram model's reason to exist: a shuffled-word doc keeps
    its unigram score but loses the conditional term."""
    import random as _random

    from wikiextractor_spark.functions.lmquality import (
        doc_logprob_scores,
        doc_logprob_scores_bigram,
        fit_bigram_lm,
    )

    sent = "the cat sat on the mat and the dog ran to the tree"
    rng = _random.Random(3)
    shuffled_words = sent.split()
    rng.shuffle(shuffled_words)
    shuffled = " ".join(shuffled_words)
    corpus = spark.createDataFrame(
        [(i, sent) for i in range(20)], "doc_id long, text string"
    )
    uni, bi = fit_bigram_lm(corpus, vocab_size=100, bigram_size=200)

    probe = spark.createDataFrame(
        [(1, sent), (2, shuffled)], "doc_id long, text string"
    )
    u = {r["doc_id"]: r["mean_logp"]
         for r in doc_logprob_scores(probe, uni).collect()}
    b = {r["doc_id"]: r["mean_logp"]
         for r in doc_logprob_scores_bigram(probe, uni, bi).collect()}
    # same multiset of words -> identical unigram scores
    assert u[1] == pytest.approx(u[2])
    # ...but the natural order scores strictly higher under bigrams
    assert b[1] > b[2] + 0.5


def test_bigram_lm_backoff_and_edges(spark):
    from wikiextractor_spark.functions.lmquality import (
        doc_logprob_scores_bigram,
        fit_bigram_lm,
    )

    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta") for i in range(10)],
        "doc_id long, text string",
    )
    uni, bi = fit_bigram_lm(corpus, vocab_size=50, bigram_size=50)
    probe = spark.createDataFrame(
        [(1, "alpha"),                  # single token: unigram only
         (2, "alpha zzz"),              # unseen pair AND unseen w2
         (3, ""),                       # no tokens: no score row
         (4, "beta alpha")],            # seen words, unseen pair
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            doc_logprob_scores_bigram(probe, uni, bi).collect()}
    assert 3 not in rows
    assert rows[1]["n_tokens"] == 1
    import math as _m
    for r in rows.values():
        assert _m.isfinite(r["mean_logp"])
    # the backoff ARM must actually fire: an unseen pair of SEEN
    # words gets (1-lam)*p_uni < lam*p_ml + (1-lam)*p_uni, so the
    # fluent seen-pair doc strictly outranks it (a regression that
    # scored unseen pairs as seen would pass finiteness alone)
    fluent = {r["doc_id"]: r["mean_logp"] for r in doc_logprob_scores_bigram(
        spark.createDataFrame([(9, "alpha beta")], "doc_id long, text string"),
        uni, bi).collect()}
    assert fluent[9] > rows[4]["mean_logp"] + 0.1
    with pytest.raises(ValueError, match="lam"):
        doc_logprob_scores_bigram(probe, uni, bi, lam=1.0)


def test_bigram_scoring_plan_broadcasts(spark):
    from wikiextractor_spark.functions.lmquality import (
        doc_logprob_scores_bigram,
        fit_bigram_lm,
    )

    corpus = spark.createDataFrame(
        [(i, "a b c d e") for i in range(5)], "doc_id long, text string"
    )
    uni, bi = fit_bigram_lm(corpus, vocab_size=20, bigram_size=20)
    plan = doc_logprob_scores_bigram(corpus, uni, bi)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_threshold_from_quantile_scores(spark):
    from wikiextractor_spark.functions.lmquality import (
        threshold_from_quantile_scores,
    )

    scores = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, mean_logp double"
    )
    thr = threshold_from_quantile_scores(scores, 0.25, relative_error=0.001)
    kept = scores.filter(F.col("mean_logp") >= thr).count()
    assert 73 <= kept <= 77
    with pytest.raises(ValueError, match="no scored rows"):
        threshold_from_quantile_scores(
            spark.createDataFrame([], "doc_id long, mean_logp double"), 0.5
        )


def test_bigram_pair_encoding_is_collision_free(spark):
    """Regex \\s does not match NUL, so tokens can CONTAIN \\x00; a
    separator encoding would collide ('a\\x00b','c') with
    ('a','b\\x00c') and fan out the scoring join.  The length-prefix
    encoding must keep them distinct — and tokens containing ':'
    (the prefix delimiter) must round-trip too."""
    from wikiextractor_spark.functions.lmquality import (
        doc_logprob_scores_bigram,
        fit_bigram_lm,
    )

    corpus = spark.createDataFrame(
        [(i, "a\x00b c") for i in range(5)]
        + [(10 + i, "a b\x00c") for i in range(5)]
        + [(20 + i, "x:y z:w") for i in range(5)],
        "doc_id long, text string",
    )
    uni, bi = fit_bigram_lm(corpus, vocab_size=50, bigram_size=50)
    pairs = {(r["w1"], r["w2"]) for r in bi.collect()}
    assert ("a\x00b", "c") in pairs and ("a", "b\x00c") in pairs
    assert ("a", "b") not in pairs  # the collision artifact
    assert ("x:y", "z:w") in pairs
    # scoring joins stay row-exact: each doc has exactly one pair
    # position + one first token
    rows = doc_logprob_scores_bigram(corpus, uni, bi).collect()
    assert all(r["n_tokens"] == 2 for r in rows)


# ---------------------- external LM adapter ----------------------


def test_logprob_table_roundtrip_and_tsv(spark, tmp_path):
    """Export a fitted unigram LM, reload it, scores bit-identical;
    TSV import with an explicit floor; floor contract raises on
    double/missing supply."""
    from wikiextractor_spark.functions import lmquality as lmq

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog ran"),
         (3, "zz qq xx unseen")],
        "doc_id long, text string",
    )
    lm = lmq.fit_unigram_lm(docs, vocab_size=100)
    path = str(tmp_path / "lm.parquet")
    lmq.save_logprob_table(lm, path)
    lm2 = lmq.load_logprob_table(spark, path)
    before = {r["doc_id"]: (r["n_tokens"], r["mean_logp"])
              for r in lmq.doc_logprob_scores(docs, lm).collect()}
    after = {r["doc_id"]: (r["n_tokens"], r["mean_logp"])
             for r in lmq.doc_logprob_scores(docs, lm2).collect()}
    assert before == after  # bit-identical round trip

    # TSV (KenLM-ish unigram dump): token<TAB>logp, floor passed in
    floor = [r["logp"] for r in lm.collect() if r["token"] is None][0]
    rows = [r for r in lm.collect() if r["token"] is not None]
    tsv = tmp_path / "lm.tsv"
    tsv.write_text("".join(f"{r['token']}\t{r['logp']}\n" for r in rows))
    lm3 = lmq.load_logprob_table(spark, str(tsv), floor_logp=floor)
    after3 = {r["doc_id"]: (r["n_tokens"], r["mean_logp"])
              for r in lmq.doc_logprob_scores(docs, lm3).collect()}
    assert before == after3

    with pytest.raises(ValueError, match="floor"):
        lmq.load_logprob_table(spark, path, floor_logp=-5.0)
    with pytest.raises(ValueError, match="floor"):
        lmq.load_logprob_table(spark, str(tsv))


# ---------------------- corpus drift (LM divergence) ----------------------


def test_lm_divergence_identical_shifted_disjoint(spark):
    from wikiextractor_spark.functions import lmquality as lmq

    same = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog ran to the cat")],
        "doc_id long, text string",
    )
    shifted = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "buy casino bonus now deals")],
        "doc_id long, text string",
    )
    disjoint = spark.createDataFrame(
        [(1, "zz qq xx yy ww vv"), (2, "aa bb cc dd ee ff")],
        "doc_id long, text string",
    )
    lm1 = lmq.fit_unigram_lm(same, vocab_size=100)
    lm1b = lmq.fit_unigram_lm(same, vocab_size=100)
    lm2 = lmq.fit_unigram_lm(shifted, vocab_size=100)
    lm3 = lmq.fit_unigram_lm(disjoint, vocab_size=100)

    import math as _m

    # two floor-only (empty-vocab) models: identical floored
    # distributions, divergence 0 — not a TypeError from SUM-of-none
    empty = spark.createDataFrame(
        [(None, -5.0)], "token string, logp double"
    )
    assert lmq.lm_js_divergence(empty, empty) == 0.0

    d_same = lmq.lm_js_divergence(lm1, lm1b)
    d_shift = lmq.lm_js_divergence(lm1, lm2)
    d_far = lmq.lm_js_divergence(lm1, lm3)
    assert abs(d_same) < 1e-9
    assert 0 < d_shift < d_far <= _m.log(2) + 1e-6
    # symmetric (JS property)
    assert lmq.lm_js_divergence(lm2, lm1) == pytest.approx(d_shift)

    # per-token drill-down: the spam vocabulary dominates the drift
    top = (
        lmq.token_divergence(lm1, lm2)
        .orderBy(F.desc("js_term"))
        .limit(5)
        .collect()
    )
    assert {"casino", "bonus"} & {r["token"] for r in top}

    # contract: models without a floor row raise
    with pytest.raises(ValueError, match="floor"):
        lmq.lm_js_divergence(lm1.filter(F.col("token").isNotNull()), lm2)


def test_filter_blocked_domains_multi_trailing_dots(spark):
    """ADVICE r9: the trailing strip is \\.+$ to mirror the leading
    \\.+ rule — an entry like 'bad.com..' must still match (a single
    \\.$ left 'bad.com.' behind and the entry silently never fired).
    url_domain strips ALL trailing dots too (review r9 — a pure
    mirror: the JVM URL parser itself rejects multi-dot hosts, so
    'bad.com..' URLs are NULL-host unparseable and ride the stated
    keep_unparseable contract, never a normalization mismatch)."""
    from wikiextractor_spark.functions.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [(1, "https://bad.com/x"), (2, "https://clean.org/y"),
         (3, "https://bad.com../y")],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in
            filter_blocked_domains(df, ["bad.com.."]).collect()}
    assert kept == {2, 3}  # 3 is unparseable → kept by default
    kept2 = {r["doc_id"] for r in
             filter_blocked_domains(df, ["bad.com.."],
                                    keep_unparseable=False).collect()}
    assert kept2 == {2}
