"""Gopher document-quality rules (Rae et al. 2021, appendix A1.1) —
the standard heuristic filter set production pipelines run alongside
a trained classifier.

Covered here: the DOCUMENT-SHAPE rules — word-count band, mean word
length band, symbol-to-word ratio (``#`` and ellipsis), bullet-line
and ellipsis-line fractions, alphabetic-word fraction, and the
required-stopword floor.  The REPETITION rules of the same paper
live in :mod:`wikiextractor_spark.functions.repetition` (they need
the normalized n-gram machinery); ``prepare_corpus`` exposes both
gates independently.

Shape: every signal reads from ONE bound word array and ONE bound
line array (the nested ``transform(array(...), ...)[0]`` let-binding
the repetition module established), so the whole struct is a single
narrow codegen projection — a scan-speed 100 TB pass, no UDF, no
shuffle."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from wikiextractor_spark.functions.repetition import _NONEMPTY_LINES

# the eight words Gopher requires at least two of (distinct)
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLETS = ("•", "‣", "▪", "-", "*")

_WORDS = "filter(split({t}, '\\\\s+'), w -> w != '')"
# ONE line-split definition repo-wide (CRLF-aware, trimmed,
# non-empty) — imported, not duplicated, so a line-handling fix can
# never diverge between the repetition and Gopher gates
_LINES = _NONEMPTY_LINES


def _signals_struct_sql(text_col: str) -> str:
    stop_lits = ", ".join(f"'{w}'" for w in REQUIRED_STOPWORDS)
    bullet_pred = " OR ".join(f"startswith(l, '{b}')" for b in _BULLETS)
    ws = _WORDS.format(t=text_col)
    ls = _LINES.format(t=text_col)
    # '#' count via replace-length; '...'/'…' occurrences likewise
    # (the 3-char form divides by its length)
    symbols = (
        f"(length({text_col}) - length(replace({text_col}, '#', '')))"
        f" + (length({text_col}) - length(replace({text_col}, '…', '')))"
        f" + (length({text_col}) - length(replace({text_col}, '...', ''))) div 3"
    )
    return f"""
        transform(array({ws}), ws ->
          transform(array(transform(ws, w -> lower(w))), lws ->
          transform(array({ls}), ls -> struct(
            size(ws) AS n_words,
            CASE WHEN size(ws) = 0 THEN 0.0D
                 ELSE aggregate(ws, 0L, (a, w) -> a + length(w)) * 1.0 / size(ws)
            END AS mean_word_len,
            CASE WHEN size(ws) = 0 THEN 0.0D
                 ELSE ({symbols}) * 1.0 / size(ws)
            END AS symbol_word_ratio,
            CASE WHEN size(ls) = 0 THEN 0.0D
                 ELSE size(filter(ls, l -> {bullet_pred})) * 1.0 / size(ls)
            END AS bullet_line_frac,
            CASE WHEN size(ls) = 0 THEN 0.0D
                 ELSE size(filter(ls, l -> endswith(l, '…') OR endswith(l, '...')))
                      * 1.0 / size(ls)
            END AS ellipsis_line_frac,
            CASE WHEN size(ws) = 0 THEN 0.0D
                 ELSE size(filter(ws, w -> w rlike '[A-Za-z]')) * 1.0 / size(ws)
            END AS alpha_word_frac,
            size(filter(array({stop_lits}),
                        s -> array_contains(lws, s)))
              AS stop_hits))[0])[0])[0]
        """


def gopher_signals(text_col: str = "text") -> Column:
    """All Gopher shape signals as one struct ``(n_words,
    mean_word_len, symbol_word_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, stop_hits)`` — compute once,
    gate on any."""
    return F.expr(_signals_struct_sql(text_col))


def passes_gopher_rules(
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """Boolean keep-gate with the paper's published thresholds as
    defaults — ``df.filter(passes_gopher_rules())``.  Binds the
    signal struct once and ANDs the bounds; a NULL text fails the
    gate (stated, not silent: every signal is NULL so the AND is
    NULL, which ``filter`` drops)."""
    return F.expr(
        f"""
        transform(array({_signals_struct_sql(text_col)}), s ->
          s.n_words >= {min_words} AND s.n_words <= {max_words}
          AND s.mean_word_len >= {min_mean_word_len}D
          AND s.mean_word_len <= {max_mean_word_len}D
          AND s.symbol_word_ratio <= {max_symbol_word_ratio}D
          AND s.bullet_line_frac <= {max_bullet_line_frac}D
          AND s.ellipsis_line_frac <= {max_ellipsis_line_frac}D
          AND s.alpha_word_frac >= {min_alpha_word_frac}D
          AND s.stop_hits >= {min_stop_hits})[0]
        """
    )
