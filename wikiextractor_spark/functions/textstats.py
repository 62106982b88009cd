"""Text-analysis functions for training-data pipelines: token
counting, quality scoring, language ID, fingerprinting.

All native Catalyst (string/array/higher-order functions) — these run
in whole-stage codegen on every document of a 100 TB corpus, so no
Python is allowed here.  Each has an exact DuckDB oracle twin in
``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A BPE-ish tokenizer regex: letter runs, digit runs, single
# punctuation marks (common whitespace-insensitive pre-tokenization).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic.  Deliberately literal so the oracle can inline them.
STOPWORDS = {
    "en": ("the", "of", "and", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "sur"),
}

PUNCT_PATTERN = r"[^A-Za-z0-9\s]"


def words(col: Column) -> Column:
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def bpe_token_count(col: Column) -> Column:
    """Regex pre-tokenization count (BPE-ish)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_PATTERN))


def _hits_expr(text_col: str, lang: str) -> Column:
    lits = ", ".join("'%s'" % w for w in STOPWORDS[lang])
    return F.expr(
        f"size(filter(split({text_col}, ' '), w -> array_contains(array({lits}), w)))"
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-heuristic family's
    cheapest member, fully vectorizable).  Each column re-splits the
    text — fine for a single score; for ALL scores use
    :func:`lang_hits`, which binds the split once."""
    return {lang: _hits_expr(text_col, lang) for lang in STOPWORDS}


def _stop_arrays_sql() -> str:
    return ", ".join(
        "array(%s)" % ", ".join(f"'{w}'" for w in ws)
        for ws in STOPWORDS.values()
    )


def _hits_sql(text_col: str) -> str:
    # the split is bound ONCE through the one-element-array lambda
    # idiom (see dedup._shingles_sql), and the four stopword arrays
    # live in a single folded literal — one small codegen unit instead
    # of one filter-chain per (language × reference)
    return (
        f"transform(array(split({text_col}, ' ')), ws -> "
        f"transform(array({_stop_arrays_sql()}), sw -> "
        f"size(filter(ws, w -> array_contains(sw, w)))))[0]"
    )


def lang_hits(text_col: str = "text") -> Column:
    """→ ``array<int>`` of stopword hits in STOPWORDS order
    (en, de, es, fr), computed in ONE bound expression.  Alias it to a
    column and derive lang_pred / per-language scores from the cheap
    array references — Catalyst keeps a multi-referenced non-trivial
    alias materialized, so the filter chain runs once per row."""
    return F.expr(_hits_sql(text_col))


def lang_pred_from_hits(hits: Column) -> Column:
    """argmax over a :func:`lang_hits` array, deterministic tie-break
    by the fixed language order en > de > es > fr."""
    e, d, s, f = (F.element_at(hits, i) for i in range(1, 5))
    return (
        F.when((e >= d) & (e >= s) & (e >= f), "en")
        .when((d >= s) & (d >= f), "de")
        .when(s >= f, "es")
        .otherwise("fr")
    )


def lang_id(text_col: str = "text") -> Column:
    """argmax over language scores, deterministic tie-break by the
    fixed language order en > de > es > fr.  The hits array is bound
    once via a lambda let-binding (r2 inlined the per-language filter
    chain into every CASE branch — ~11 copies in codegen)."""
    case = (
        "CASE WHEN h[0] >= h[1] AND h[0] >= h[2] AND h[0] >= h[3] THEN 'en' "
        "WHEN h[1] >= h[2] AND h[1] >= h[3] THEN 'de' "
        "WHEN h[2] >= h[3] THEN 'es' ELSE 'fr' END"
    )
    return F.expr(f"transform(array({_hits_sql(text_col)}), h -> {case})[0]")


def raw_punct_ratio(text_col: str = "text") -> Column:
    """Unrounded punctuation-character ratio.  The exact operation
    sequence (``* 1.0 /``) is mirrored in the DuckDB oracle so the
    doubles are bit-identical."""
    c = F.col(text_col)
    return (
        F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")) * F.lit(1.0)
        / F.length(c)
    )


def punct_ratio(col: Column) -> Column:
    return F.round(
        F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", "")) * F.lit(1.0)
        / F.length(col),
        6,
    )


def raw_stopword_ratio(text_col: str = "text") -> Column:
    total = F.size(F.split(F.col(text_col), " "))
    return _hits_expr(text_col, "en") * F.lit(1.0) / total


def quality_score(text_col: str = "text") -> Column:
    """Composite quality heuristic: length band + stopword density −
    punctuation noise.  The formula uses UNROUNDED ratios and one
    final round, with the identical operation order in the oracle."""
    n_chars = F.length(F.col(text_col))
    length_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * length_term
        + F.lit(4.0) * raw_stopword_ratio(text_col)
        - F.lit(0.3) * raw_punct_ratio(text_col),
        6,
    )


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 over lowercased, whitespace-collapsed
    text (the exact-dedup key for fuzzy-normalized content)."""
    return F.md5(F.regexp_replace(F.lower(col), r"\s+", " "))


def min_word_hash(col: Column) -> Column:
    """1-hash MinHash over words — the cheapest document sketch."""
    return F.array_min(F.transform(words(col), F.md5))


ROLLING_FP_MOD = 2_147_483_647  # Mersenne prime 2^31 - 1


def rolling_fingerprint(col: Column, base: int = 1_000_003) -> Column:
    """Order-sensitive polynomial rolling hash over word hashes:
    ``h = (h * base + (xxhash64(word) mod M)) mod M`` with
    M = 2³¹−1, one O(words) aggregate pass (Rabin-Karp family).

    The explicit modulus keeps every intermediate < 2⁵², so the math
    is safe under ANSI mode (Spark 4 default) where a bigint
    wraparound would *throw*, and the identity stays portable to any
    engine with 64-bit integers.

    Complements :func:`fingerprint` (md5 of normalized text — order
    falls out of the byte stream): the rolling form is incrementally
    composable, so shard-level fingerprints combine without
    re-reading text — ``h(a ++ b) = (h(a) * base^|b| + h(b)) mod M``
    — which is what a 100 TB tree-reduction wants.  All JVM-side:
    xxhash64 per word, no crypto hash, no Python."""
    m = F.lit(ROLLING_FP_MOD).cast("long")
    b = F.lit(base).cast("long")
    ws = F.split(F.regexp_replace(F.lower(col), r"\s+", " "), " ")
    return F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * b + F.pmod(F.xxhash64(w), m), m),
    )
