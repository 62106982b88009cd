"""Unicode text canonicalization for training-data pipelines: NFC /
NFD / NFKC / NFKD normalization and accent stripping.

Crawled corpora mix byte-identical-looking strings that differ in
codepoint sequence — composed ``é`` (U+00E9) vs decomposed
``e`` + U+0301, the Angstrom SIGN vs ``Å``, compatibility ligatures —
and every downstream content-keyed stage (exact dedup, MinHash
shingles, URL keys, fingerprints) silently treats them as distinct
documents unless the text is canonicalized first.  The standard prep
step is NFC (or NFKC when compatibility folding is wanted) before any
hashing; accent stripping is the classic fold for matching /
search-key normalization (it is also what BERT's BasicTokenizer
``strip_accents`` does — composing this upstream of
:mod:`wordpiece` reproduces that stage).

Spark has no built-in normalization function, so the kernels are
Arrow-batched pandas UDFs over the stdlib ``unicodedata`` table — the
acceptable floor for a pass with no native expression.  Two design
points keep it cheap at corpus scale:

* ``maybe_denormalized`` is the NATIVE pre-gate: pure-ASCII text is
  normalization-invariant under all four forms (ASCII codepoints are
  their own canonical/compatibility decomposition and recomposition),
  so only rows containing a non-ASCII byte need the Python crossing
  at all — gate the kernel behind it and the clean-ASCII majority of
  a crawl never leaves the JVM (the :func:`~wikiextractor_spark.
  functions.pii.has_pii` skip pattern);
* normalization is idempotent and per-row, so the kernel composes
  anywhere in a plan without ordering constraints.

Accent stripping here is NFD followed by dropping combining marks
(``unicodedata.combining(c) != 0``) — verified equivalent to
DuckDB's utf8proc-based ``strip_accents`` on the battery adversaria
(the oracle runs DuckDB's OWN implementation against this one, a
genuinely independent restatement).  Characters with no canonical
decomposition (``ß``, ``ø``) pass through unchanged, matching both
implementations.

No reference counterpart — engine extension (SURVEY.md §2.12)."""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def _check_form(form: str, caller: str) -> str:
    if form not in _FORMS:
        raise ValueError(
            f"{caller}: form must be one of {_FORMS}, got {form!r}"
        )
    return form


def _normalize_one(t, form: str):
    """One value through ``unicodedata.normalize`` — NULL stays
    NULL.  Driver-side twin of the kernel body (tests differential
    against DuckDB's implementation go through this)."""
    return None if t is None else unicodedata.normalize(form, t)


def _strip_accents_one(t):
    """NFD, then drop combining marks; NULL stays NULL."""
    if t is None:
        return None
    return "".join(
        c for c in unicodedata.normalize("NFD", t)
        if not unicodedata.combining(c)
    )


def unicode_normalize(col, form: str = "NFC") -> Column:
    """``col`` normalized to the given Unicode form, as a Column —
    NFC by default (the canonicalize-before-hashing choice; pass
    ``NFKC`` to also fold compatibility characters like ligatures and
    width variants).  NULL stays NULL.  One Arrow-batched kernel;
    gate it behind :func:`maybe_denormalized` on mostly-ASCII corpora
    so the clean majority skips the Python crossing."""
    _check_form(form, "unicode_normalize")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _normalize_one(t, form))

    return _norm(F.col(col) if isinstance(col, str) else col)


def strip_accents(col) -> Column:
    """``col`` with accents removed (NFD + drop combining marks), as
    a Column — the match-key fold, and BERT BasicTokenizer's
    ``strip_accents`` stage when composed upstream of
    :mod:`wordpiece`.  NULL stays NULL."""

    @F.pandas_udf("string")
    def _fold(s: pd.Series) -> pd.Series:
        return s.map(_strip_accents_one)

    return _fold(F.col(col) if isinstance(col, str) else col)


def maybe_denormalized(col) -> Column:
    """True when the text contains any non-ASCII character — the
    NATIVE pre-gate for the kernels above: pure-ASCII text is
    invariant under every normalization form and under accent
    stripping, so ``F.when(maybe_denormalized(c), unicode_normalize
    (c)).otherwise(c)`` keeps the ASCII majority of a crawl entirely
    JVM-side.  NULL stays NULL (``rlike`` on NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("[^\\x00-\\x7F]")
