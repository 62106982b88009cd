"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
the MOSS algorithm).

MinHash (``dedup.py``) answers "are these two DOCUMENTS similar as
sets"; winnowing selects POSITION-ANCHORED local fingerprints with a
guarantee the sketches cannot give: any shared substring of length at
least ``w + k - 1`` characters produces at least one IDENTICAL
selected fingerprint in both documents (the published coverage
guarantee), and no substring match shorter than ``k`` is detected.
That makes it the standard primitive for plagiarism/attribution-style
overlap detection and another candidate generator for sub-document
dedup, complementary to the n-word-gram approach of ``spans.py``
(character grain, density-bounded output ~2/(w+1) of positions
instead of every gram).

Published selection rule, implemented verbatim: hash every character
``k``-gram; over each window of ``w`` consecutive hashes select the
MINIMUM, breaking ties to the RIGHTMOST occurrence; fingerprints are
the distinct (position, hash) selections.  A document with fewer
than ``w`` k-gram hashes degrades to one degenerate window over all
of them (one fingerprint — shorter-than-window documents still
fingerprint); a document shorter than ``k`` has none.

Hash: the engine's shared FULL-WIDTH md5 construction (first 15 hex
of ``md5(gram)`` as a 60-bit integer — ``sampling._hash_u60`` with an
empty salt), chosen over xxhash64 because the battery oracle restates
it exactly.  Width matters here (r13 review): a 1e6-bucket hash
SATURATES document frequency at corpus scale — at ~600 selected
fingerprints per document, a few thousand documents make every bucket
ubiquitous, the ``max_df`` stop-gram cut then deletes the whole
space, and collisions silently merge real shared substrings into
cut buckets.  At 60 bits collisions are ~n²/2⁶¹ across a corpus —
negligible candidate noise that downstream verification filters.

100 TB shape: fingerprint selection is ONE narrow per-document
projection — all higher-order functions over the text column, no
shuffle, no Python (the O(n·w) window-min is native; w is small by
design).  Matching is the LSH-candidate shape: explode fingerprints,
one groupBy on the hash with map-side combine, pair expansion only
inside buckets (never a cartesian), exactly ``dedup.py``'s banded
join discipline.

No reference counterpart — engine extension (SURVEY.md §2.12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: published guidance: t = w + k - 1 is the guarantee threshold —
#: every shared substring of at least t characters is detected
DEFAULT_K = 5
DEFAULT_W = 4


def _check_kw(k: int, w: int, caller: str) -> None:
    if not isinstance(k, int) or isinstance(k, bool) or k < 1:
        raise ValueError(f"{caller}: k must be a positive int, got {k!r}")
    if not isinstance(w, int) or isinstance(w, bool) or w < 1:
        raise ValueError(f"{caller}: w must be a positive int, got {w!r}")


def _fingerprint_expr(text_col: str, k: int, w: int) -> F.Column:
    """array<struct<pos,fp>> of the winnowing selections (with
    duplicate window selections still present — the consumer
    DISTINCTs after explode, cheaper than a per-row array dedup)."""
    # k-gram hashes, 0-based positions — the shared full-width md5
    # construction (sampling._hash_u60, empty salt) in SQL form.
    # The shorter-than-k case needs an explicit empty branch:
    # sequence(0, -1) in Spark is the DESCENDING [0, -1], not empty.
    hs = (
        f"CASE WHEN length({text_col}) < {k} "
        f"THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE transform(sequence(0, length({text_col}) - {k}), "
        f"i -> CAST(conv(substring(md5(substring({text_col}, i + 1, {k})), "
        f"1, 15), 16, 10) AS BIGINT)) END"
    )
    # one window's selection: min of the slice, rightmost on ties via
    # reverse + array_position (1-based from the right)
    def sel(start: str, width: str) -> str:
        sl = f"slice(_hs, {start} + 1, {width})"
        return (
            f"named_struct("
            f"'pos', CAST({start} + {width} - array_position("
            f"reverse({sl}), array_min({sl})) AS INT), "
            f"'fp', array_min({sl}))"
        )

    return F.expr(
        f"""
        transform(array({hs}), _hs ->
          CASE
            WHEN size(_hs) = 0 THEN
              CAST(array() AS ARRAY<STRUCT<pos: INT, fp: BIGINT>>)
            WHEN size(_hs) < {w} THEN array({sel('0', 'size(_hs)')})
            ELSE transform(sequence(0, size(_hs) - {w}),
                           s -> {sel('s', str(w))})
          END)[0]
        """
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = DEFAULT_K, w: int = DEFAULT_W,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(id_col, pos, fp)``: each document's distinct winnowing
    fingerprints — ``pos`` the 0-based character position of the
    selected k-gram, ``fp`` its hash.  NULL-text documents emit no
    rows (they have no substrings to match).  One narrow native
    projection + explode; the DISTINCT is per (doc, pos, fp) with
    map-side combine."""
    _check_kw(k, w, "winnow_fingerprints")
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            id_col,
            F.explode(_fingerprint_expr(text_col, k, w)).alias("_s"),
        )
        .select(id_col, F.col("_s.pos").alias("pos"),
                F.col("_s.fp").alias("fp"))
        .distinct()
    )


def winnow_candidate_pairs(
    docs: DataFrame, k: int = DEFAULT_K, w: int = DEFAULT_W,
    min_shared: int = 2, max_df: int = 1000,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(id_a, id_b, n_shared)``: document pairs sharing at least
    ``min_shared`` distinct fingerprint HASHES (id_a < id_b) — the
    overlap-candidate generator: by the published guarantee, two
    documents sharing any substring of ``w + k - 1``+ characters
    share at least one selected fingerprint.

    ``max_df`` is the STOP-GRAM cut that keeps the join sub-quadratic
    on natural text: a character k-gram like ``' the '`` is selected
    in nearly every document, and its bucket alone would expand to
    O(n²) pairs carrying zero overlap signal (every pair shares it).
    Fingerprints selected by more than ``max_df`` documents are
    dropped before pairing — the small hot set rides a broadcast
    anti-join — so the coverage guarantee holds for substrings whose
    fingerprints are not corpus-ubiquitous (stated; the same
    selectivity argument MinHash banding makes by construction).

    Scale shape past the cut: one groupBy on the fingerprint hash
    (map-side combined), pair expansion only WITHIN a hash bucket
    now bounded by ``max_df``, never a cartesian; verify candidates
    downstream (exact substring / Jaccard) exactly like the LSH
    path."""
    _check_kw(k, w, "winnow_candidate_pairs")
    if min_shared < 1:
        raise ValueError(
            f"winnow_candidate_pairs: min_shared must be >= 1, got "
            f"{min_shared}"
        )
    if max_df < 2:
        raise ValueError(
            f"winnow_candidate_pairs: max_df must be >= 2 (below "
            f"that no pair can share a surviving fingerprint), got "
            f"{max_df}"
        )
    # (id, fp) distinct straight off the raw selections — routing
    # through winnow_fingerprints would pay an extra (id, pos, fp)
    # exchange the pairing path never uses (r13 review)
    fps = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            id_col,
            F.explode(_fingerprint_expr(text_col, k, w)).alias("_s"),
        )
        .select(id_col, F.col("_s.fp").alias("fp"))
        .distinct()
    )
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > max_df)
        .select("fp")
    )
    kept = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = kept.select(F.col(id_col).alias("id_a"), "fp")
    b = kept.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
