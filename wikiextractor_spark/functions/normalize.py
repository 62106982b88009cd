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
  at all.  The skip must be a SPLIT-PATH composition
  (:func:`normalize_if_needed`: filter → kernel → union) — a
  ``F.when(gate, kernel).otherwise(col)`` projection is value-correct
  but does NOT skip the kernel, because Catalyst extracts Python UDFs
  out of conditionals and evaluates them for every row (unlike the
  all-native :func:`~wikiextractor_spark.functions.pii.has_pii` skip
  pattern, where the conditional genuinely short-circuits);
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
    width variants).  NULL stays NULL.  One Arrow-batched kernel; on
    mostly-ASCII corpora prefer :func:`normalize_if_needed`, whose
    split-path composition actually skips the Python crossing for
    clean rows (wrapping this Column in ``F.when`` does not — see
    the module docstring)."""
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
    NATIVE pre-gate behind :func:`normalize_if_needed`: pure-ASCII
    text is invariant under every normalization form and under
    accent stripping, so rows where this is false can skip the
    kernels entirely.  The skip requires the split-path composition
    (``F.when(gate, kernel)`` still evaluates the kernel per row —
    module docstring).  NULL stays NULL (``rlike`` on NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("[^\\x00-\\x7F]")


def normalize_if_needed(
    df, text_col: str = "text", out_col: str | None = None,
    form: str = "NFC",
) -> "DataFrame":
    """``df`` with ``out_col`` (default: ``text_col`` rewritten in
    place) = the text normalized to ``form`` — via the split-path
    composition that ACTUALLY skips the Python crossing for the
    clean-ASCII majority: rows failing :func:`maybe_denormalized`
    (including NULL text, which is invariant) keep their text with
    zero kernel cost; only rows carrying a non-ASCII character run
    :func:`unicode_normalize`; the two legs re-union.  Values are
    identical to the ungated kernel (pinned by pytest); row order is
    not preserved (a union of two filtered legs — normalization is
    per-row, so no consumer here depends on order).

    The two legs each EXECUTE the upstream plan (Spark does not share
    scans across a union's branches): right over a source read the
    extra scan is cheap column-pruned I/O and the kernel skip
    dominates, but over an expensive composed lineage the double
    execution can cost more than the skip saves — cache/checkpoint
    the input first, or use the plain kernel (what ``prepare_corpus``
    does inside its lazy pipeline).  A NONDETERMINISTIC upstream
    (``rand()`` sampling, unordered ``limit``) is unsafe here: the
    legs may see different rows, duplicating or dropping — the same
    caveat as any multi-reference over such a plan."""
    _check_form(form, "normalize_if_needed")
    out = text_col if out_col is None else out_col
    gate = maybe_denormalized(text_col)
    dirty = df.filter(gate).withColumn(
        out, unicode_normalize(text_col, form)
    )
    clean = df.filter(gate.isNull() | ~gate).withColumn(
        out, F.col(text_col)
    )
    return dirty.unionByName(clean)
