"""Gopher-style repetition signals for corpus quality filtering.

Rae et al. (Gopher, arXiv:2112.11446) filter documents whose content
is dominated by repeated lines or n-grams — boilerplate, scraped
navigation, keyword stuffing.  These are the engine's native
equivalents, computed per document with higher-order functions: no
Python, no shuffle, scan-speed on every row of a 100 TB corpus.

The per-document line/gram counts here are intentionally O(L²) /
O(G²) *within one row* (an equality-filter per element): documents
have tens-to-hundreds of lines and a few hundred grams, so the inner
loop is thousands of comparisons inside whole-stage codegen — far
cheaper than the shuffle a groupBy-per-(doc, line) formulation would
pay, and it keeps the operator embarrassingly parallel.

All arrays are bound once per row through the one-element-array
lambda idiom (see dedup._shingles_sql) so the split/tokenize pass is
never re-evaluated per element.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_NONEMPTY_LINES = "filter(transform(split({t}, '\\n'), l -> trim(l)), l -> l != '')"


def dup_line_fraction(text_col: str = "text") -> Column:
    """Fraction of non-empty lines that are repeats of another line
    (0.0 when every line is unique; 0 for empty docs)."""
    return F.expr(
        f"""
        transform(array({_NONEMPTY_LINES.format(t=text_col)}), ls ->
          CASE WHEN size(ls) = 0 THEN 0.0D
               ELSE (size(ls) - size(array_distinct(ls))) * 1.0 / size(ls)
          END)[0]
        """
    )


def dup_line_char_fraction(text_col: str = "text") -> Column:
    """Fraction of line characters living in lines that occur more
    than once — the character-weighted variant (a short nav line
    repeated 50× dominates here even when long unique lines keep the
    line-count fraction low)."""
    ls = _NONEMPTY_LINES.format(t=text_col)
    return F.expr(
        f"""
        transform(array({ls}), ls ->
          CASE WHEN size(ls) = 0 THEN 0.0D
               ELSE aggregate(ls, 0L, (acc, l) ->
                      acc + CASE WHEN size(filter(ls, x -> x = l)) > 1
                                 THEN length(l) ELSE 0L END) * 1.0
                    / aggregate(ls, 0L, (acc, l) -> acc + length(l))
          END)[0]
        """
    )


def _grams_sql(text_col: str, n: int) -> str:
    # drop empty words so a whitespace-only doc yields ZERO grams
    # (one ''-gram would score top_ngram_frac = 1.0 and wrongly flag
    # empty docs as repetitive)
    raw = f"split(trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ')), ' ')"
    return (
        f"transform(array(filter({raw}, w -> w != '')), ws -> "
        f"CASE WHEN size(ws) = 0 THEN array() "
        f"WHEN size(ws) < {n} THEN array(concat_ws(' ', ws)) "
        f"ELSE transform(sequence(0, size(ws) - {n}), "
        f"i -> concat_ws(' ', slice(ws, i + 1, {n}))) END)[0]"
    )


def top_ngram_fraction(text_col: str = "text", n: int = 2) -> Column:
    """Fraction of gram positions taken by the single most frequent
    word ``n``-gram (Gopher's top-2/3/4-gram signal, token-weighted).
    1.0 means one phrase IS the document."""
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    return F.expr(
        f"""
        transform(array({_grams_sql(text_col, n)}), gs ->
          CASE WHEN size(gs) = 0 THEN 0.0D
               ELSE array_max(transform(array_distinct(gs), g ->
                      size(filter(gs, x -> x = g)))) * 1.0 / size(gs)
          END)[0]
        """
    )


def dup_ngram_fraction(text_col: str = "text", n: int = 5) -> Column:
    """Fraction of gram positions whose ``n``-gram occurs more than
    once in the document (Gopher's duplicate-5..10-gram family)."""
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    return F.expr(
        f"""
        transform(array({_grams_sql(text_col, n)}), gs ->
          CASE WHEN size(gs) = 0 THEN 0.0D
               ELSE size(filter(gs, g -> size(filter(gs, x -> x = g)) > 1))
                    * 1.0 / size(gs)
          END)[0]
        """
    )


def repetition_signals(text_col: str = "text") -> Column:
    """All repetition signals as one struct column
    ``(dup_line_frac, dup_line_char_frac, top_2gram_frac,
    top_3gram_frac, dup_5gram_frac)`` — compute once, gate on any."""
    return F.struct(
        dup_line_fraction(text_col).alias("dup_line_frac"),
        dup_line_char_fraction(text_col).alias("dup_line_char_frac"),
        top_ngram_fraction(text_col, 2).alias("top_2gram_frac"),
        top_ngram_fraction(text_col, 3).alias("top_3gram_frac"),
        dup_ngram_fraction(text_col, 5).alias("dup_5gram_frac"),
    )


def is_repetitive(
    text_col: str = "text",
    *,
    min_words: int = 20,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_2gram_frac: float = 0.20,
    max_top_3gram_frac: float = 0.18,
    max_dup_5gram_frac: float = 0.15,
) -> Column:
    """Boolean repetition gate with Gopher-flavored default
    thresholds — ``df.filter(~is_repetitive())`` keeps clean docs.

    Docs under ``min_words`` are never flagged here: a 4-word doc has
    top-2-gram fraction 1/3 by construction, so the ratio thresholds
    only mean something past a minimum length (Gopher likewise gates
    short docs with a separate length filter, not these signals)."""
    long_enough = (
        F.size(F.split(F.trim(F.regexp_replace(
            F.lower(F.col(text_col)), "[^a-z0-9]+", " ")), " "))
        >= min_words
    )
    return long_enough & (
        (dup_line_fraction(text_col) > max_dup_line_frac)
        | (dup_line_char_fraction(text_col) > max_dup_line_char_frac)
        | (top_ngram_fraction(text_col, 2) > max_top_2gram_frac)
        | (top_ngram_fraction(text_col, 3) > max_top_3gram_frac)
        | (dup_ngram_fraction(text_col, 5) > max_dup_5gram_frac)
    )
