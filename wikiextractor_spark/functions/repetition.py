"""Gopher-style repetition signals for corpus quality filtering.

Rae et al. (Gopher, arXiv:2112.11446) filter documents whose content
is dominated by repeated lines or n-grams — boilerplate, scraped
navigation, keyword stuffing.  These are the engine's native
equivalents, computed per document with higher-order functions: no
Python, no shuffle, scan-speed on every row of a 100 TB corpus.

Counting strategy: higher-order-function lambdas are *interpreted*
per element (they sit outside whole-stage codegen), so the naive
"equality-filter per element" formulation is O(G²) interpreted ops
per document — ~1M per 1000-word doc per signal, which is real money
at corpus scale.  Instead every count here is ``array_sort`` + one
``aggregate`` pass over runs of equal elements: O(G log G) with G
interpreted steps, ~100× fewer lambda evaluations on a 1000-word doc
(measured: 2.4 s → 1.2 s for the 5-signal struct over sf0.1's
~50-word docs, and ~5 ms/doc on 1000-word docs where the quadratic
form would pay ~100 ms/doc).

All arrays are bound once per row through the one-element-array
lambda idiom (see dedup._shingles_sql); ``repetition_signals`` binds
the normalized word array ONCE for all three gram signals.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# split on \r?\n: SQL trim() does NOT strip \r, so a CRLF corpus
# would otherwise see every line carry a trailing \r — breaking
# equality-based dup detection AND diverging from the naive-Python
# differential (whose str.strip() removes \r)
_NONEMPTY_LINES = (
    "filter(transform(split({t}, '\\\\r?\\\\n'), l -> trim(l)), l -> l != '')"
)

# words of the normalized text; empty docs yield [] (one ''-gram
# would score top_ngram_frac = 1.0 and wrongly flag empty docs)
_NORM_WORDS = (
    "filter(split(trim(regexp_replace(lower({t}), '[^a-z0-9]+', ' ')), ' '), "
    "w -> w != '')"
)


def _grams_from_ws(n: int) -> str:
    """Gram array built from an in-scope ``ws`` lambda variable."""
    return (
        f"CASE WHEN size(ws) = 0 THEN array() "
        f"WHEN size(ws) < {n} THEN array(concat_ws(' ', ws)) "
        f"ELSE transform(sequence(0, size(ws) - {n}), "
        f"i -> concat_ws(' ', slice(ws, i + 1, {n}))) END"
    )


def _top_run_sql(arr: str) -> str:
    """Longest run of equal elements in sorted ``arr`` — the count of
    the most frequent element, in one O(G) aggregate pass."""
    return f"""
      aggregate(array_sort({arr}),
        struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best),
        (a, g) -> CASE WHEN a.prev IS NOT NULL AND g = a.prev
          THEN struct(g AS prev, a.run + 1L AS run,
                      greatest(a.best, a.run + 1L) AS best)
          ELSE struct(g AS prev, 1L AS run, greatest(a.best, 1L) AS best) END,
        a -> a.best)
    """


def _dup_positions_sql(arr: str, weight: str = "1L") -> str:
    """Sum of ``weight`` over elements that occur more than once
    (both copies of a pair count), via sorted-run scanning.  ``weight``
    is an expression over the element variable ``g``."""
    return f"""
      aggregate(array_sort({arr}),
        struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS dups),
        (a, g) -> CASE WHEN a.prev IS NOT NULL AND g = a.prev
          THEN struct(g AS prev, a.run + 1L AS run,
                      a.dups + CASE WHEN a.run = 1L THEN 2L * ({weight})
                                    ELSE CAST(({weight}) AS BIGINT) END AS dups)
          ELSE struct(g AS prev, 1L AS run, a.dups AS dups) END,
        a -> a.dups)
    """


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
               ELSE {_dup_positions_sql("ls", weight="length(g)")} * 1.0
                    / aggregate(ls, 0L, (acc, l) -> acc + length(l))
          END)[0]
        """
    )


def top_ngram_fraction(text_col: str = "text", n: int = 2) -> Column:
    """Fraction of gram positions taken by the single most frequent
    word ``n``-gram (Gopher's top-2/3/4-gram signal, token-weighted).
    1.0 means one phrase IS the document."""
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    return F.expr(
        f"""
        transform(array({_NORM_WORDS.format(t=text_col)}), ws ->
          transform(array({_grams_from_ws(n)}), gs ->
            CASE WHEN size(gs) = 0 THEN 0.0D
                 ELSE {_top_run_sql("gs")} * 1.0 / size(gs)
            END)[0])[0]
        """
    )


def dup_ngram_fraction(text_col: str = "text", n: int = 5) -> Column:
    """Fraction of gram positions whose ``n``-gram occurs more than
    once in the document (Gopher's duplicate-5..10-gram family)."""
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    return F.expr(
        f"""
        transform(array({_NORM_WORDS.format(t=text_col)}), ws ->
          transform(array({_grams_from_ws(n)}), gs ->
            CASE WHEN size(gs) = 0 THEN 0.0D
                 ELSE {_dup_positions_sql("gs")} * 1.0 / size(gs)
            END)[0])[0]
        """
    )


def _signals_struct_sql(text_col: str) -> str:
    """SQL for the bound signal struct ``(n_words, dup_line_frac,
    dup_line_char_frac, top_2gram_frac, top_3gram_frac,
    dup_5gram_frac)`` — nested lambda binding: the outer transform
    binds the line array, the inner binds the normalized word array,
    so all signals share one split + one normalization per row."""

    def gram_signal(n: int, body: str) -> str:
        return (
            f"transform(array({_grams_from_ws(n)}), gs -> "
            f"CASE WHEN size(gs) = 0 THEN 0.0D ELSE {body} END)[0]"
        )

    ls = _NONEMPTY_LINES.format(t=text_col)
    ws = _NORM_WORDS.format(t=text_col)
    return f"""
        transform(array({ls}), ls ->
          transform(array({ws}), ws -> struct(
            size(ws) AS n_words,
            CASE WHEN size(ls) = 0 THEN 0.0D
                 ELSE (size(ls) - size(array_distinct(ls))) * 1.0 / size(ls)
            END AS dup_line_frac,
            CASE WHEN size(ls) = 0 THEN 0.0D
                 ELSE {_dup_positions_sql("ls", weight="length(g)")} * 1.0
                      / aggregate(ls, 0L, (acc, l) -> acc + length(l))
            END AS dup_line_char_frac,
            {gram_signal(2, _top_run_sql("gs") + " * 1.0 / size(gs)")}
              AS top_2gram_frac,
            {gram_signal(3, _top_run_sql("gs") + " * 1.0 / size(gs)")}
              AS top_3gram_frac,
            {gram_signal(5, _dup_positions_sql("gs") + " * 1.0 / size(gs)")}
              AS dup_5gram_frac))[0])[0]
        """


def repetition_signals(text_col: str = "text") -> Column:
    """All repetition signals as one struct column ``(n_words,
    dup_line_frac, dup_line_char_frac, top_2gram_frac,
    top_3gram_frac, dup_5gram_frac)`` — compute once, gate on any."""
    return F.expr(_signals_struct_sql(text_col))


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
    short docs with a separate length filter, not these signals).

    The gate binds the signal STRUCT once and compares its fields —
    composing the five standalone signal functions instead would
    re-normalize and re-sort per signal (measured 4.0 s vs 1.3 s over
    sf0.1)."""
    return F.expr(
        f"""
        transform(array({_signals_struct_sql(text_col)}), s ->
          s.n_words >= {min_words} AND (
            s.dup_line_frac > {max_dup_line_frac}D
            OR s.dup_line_char_frac > {max_dup_line_char_frac}D
            OR s.top_2gram_frac > {max_top_2gram_frac}D
            OR s.top_3gram_frac > {max_top_3gram_frac}D
            OR s.dup_5gram_frac > {max_dup_5gram_frac}D))[0]
        """
    )
