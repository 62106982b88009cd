"""Repeated-span detection and trimming: sub-document deduplication.

Document-grain dedup (exact / MinHash / SimHash — ``dedup.py``) keeps
one copy of near-identical DOCUMENTS, but web corpora also repeat
long SPANS inside otherwise-distinct documents: boilerplate headers,
license blocks, quoted paragraphs, templated passages.  Training on
them inflates memorization; the published remedy (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr variant) removes every occurrence of any substring that
appears more than once in the corpus, above a minimum length.

This module implements the word-gram formulation of that recipe
(fixed ``n``-word windows instead of suffix-array substrings — the
distributed-friendly equivalent; a span of ≥ n repeated words is
covered by at least one repeated n-gram, so recall at the n-word
grain matches, at word—not byte—resolution):

100 TB shape
------------
* gram pass: one NARROW projection per doc — split once, hash every
  n-word window with ``xxhash64`` (JVM, codegen), carry positions
  through ``posexplode``.
* repeated set: ONE shuffle, groupBy gram_hash with map-side partial
  counts — the same shape as the decontamination gram join, except
  both sides are the corpus (that is inherent to the problem: it IS
  a corpus self-join at gram grain, and the published suffix-array
  approach is likewise a global sort of the corpus).
* trim: positions of surviving grams roll up per doc (second
  shuffle, keyed on the doc id), merged into covered intervals and
  cut from the word array with native higher-order functions — no
  Python in any row-wise path.

Within-document repeats count toward ``min_count`` by design: a
20-word window repeated inside one document is the same boilerplate
signal (Lee et al. dedup within documents too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# interval merge over sorted start positions: fold each start p into
# an array of (s, e) structs, extending the last interval when the
# new span [p, p+n) overlaps or touches it
_MERGE_INTERVALS = """
    aggregate(
      {starts},
      CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>),
      (acc, p) -> CASE
        WHEN size(acc) > 0 AND p <= element_at(acc, -1).e
        THEN concat(
          slice(acc, 1, size(acc) - 1),
          array(named_struct(
            's', element_at(acc, -1).s,
            'e', greatest(element_at(acc, -1).e, p + {n}))))
        ELSE concat(acc, array(named_struct('s', p, 'e', p + {n})))
      END)
"""


def _gram_positions(
    docs: DataFrame, n: int, text_col: str, id_col: str,
) -> DataFrame:
    """→ ``(id, pos, gram_hash)``: one row per n-word window.  Docs
    shorter than ``n`` words emit nothing — they cannot contain an
    n-word repeated span."""
    grams = F.expr(
        f"""
        transform(array(split({text_col}, ' ')), ws ->
          CASE WHEN size(ws) < {n} THEN array()
               ELSE transform(sequence(0, size(ws) - {n}),
                              i -> xxhash64(concat_ws(' ', slice(ws, i + 1, {n}))))
          END)[0]
        """
    )
    return (
        docs.select(F.col(id_col), grams.alias("_grams"))
        .select(F.col(id_col), F.posexplode("_grams").alias("pos", "gram_hash"))
    )


def repeated_span_positions(
    docs: DataFrame, n: int = 20, min_count: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(id, pos)`` of every n-word window whose content appears at
    least ``min_count`` times across the whole corpus (all
    occurrences reported, per the remove-every-copy recipe)."""
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"need min_count >= 2, got {min_count}")
    # flagged-set topology (same as remove_boilerplate_lines below):
    # the count goes through groupBy, whose map-side partial
    # aggregation collapses each hot gram to one row per task BEFORE
    # the exchange — a window-over-gram_hash count would instead ship
    # every occurrence of a gram to a single task, and the operator's
    # home workload (boilerplate repeated across billions of pages)
    # produces exactly those hot keys.  The flagged inventory is
    # sparse in healthy corpora, so the membership join back onto the
    # positions is AQE-broadcastable: the exploded rows are never
    # shuffled at all, only recomputed from the narrow scan.
    pos = _gram_positions(docs, n, text_col, id_col)
    flagged = (
        pos.groupBy("gram_hash")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram_hash")
    )
    return pos.join(flagged, "gram_hash", "semi").select(id_col, "pos")


def repeated_span_report(
    docs: DataFrame, n: int = 20, min_count: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(id, n_words, n_spans, n_covered, covered_frac)`` per
    document: how much of it is corpus-repeated material.  Documents
    with no repeated span report zeros (never dropped silently)."""
    starts = (
        repeated_span_positions(docs, n, min_count, text_col, id_col)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("_starts"))
        .withColumn(
            "_iv", F.expr(_MERGE_INTERVALS.format(starts="_starts", n=n))
        )
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_words"),
    )
    return (
        base.join(starts.select(id_col, "_iv"), id_col, "left")
        .select(
            id_col,
            "n_words",
            F.coalesce(F.size("_iv"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(
                F.expr("aggregate(_iv, 0, (a, iv) -> a + iv.e - iv.s)"),
                F.lit(0),
            ).cast("long").alias("n_covered"),
        )
        .withColumn(
            "covered_frac",
            F.round(
                F.least(F.col("n_covered") / F.col("n_words"), F.lit(1.0)), 6
            ),
        )
    )


def trim_repeated_spans(
    docs: DataFrame, n: int = 20, min_count: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Remove every corpus-repeated n-word span from every document
    (all copies — the ExactSubstr policy; pair with document-grain
    dedup, which keeps one copy of whole near-identical docs).

    Output: the input columns with ``text_col`` rewritten to the
    surviving words and ``n_removed_words`` appended.  Documents with
    nothing repeated pass through with their text byte-identical
    (single-space token grain, like every text operator here).
    Coverage intervals may overrun a doc's end only conceptually —
    merged ``e`` is capped by construction at (last start + n) ≤
    word count."""
    starts = (
        repeated_span_positions(docs, n, min_count, text_col, id_col)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("_starts"))
        .withColumn(
            "_iv", F.expr(_MERGE_INTERVALS.format(starts="_starts", n=n))
        )
        .select(id_col, "_iv")
    )
    # the repeated set is sparse in healthy corpora, so the rollup is
    # small and AQE broadcasts this join; per-word coverage check is
    # O(words × merged-intervals) with intervals already coalesced
    out_cols = [c for c in docs.columns]
    kept = F.expr(
        f"""
        transform(array(split({text_col}, ' ')), ws ->
          filter(transform(sequence(0, size(ws) - 1),
                           i -> named_struct('i', i, 'w', element_at(ws, i + 1))),
                 p -> _iv IS NULL OR
                      NOT exists(_iv, iv -> p.i >= iv.s AND p.i < iv.e)))[0]
        """
    )
    return (
        docs.join(starts, id_col, "left")
        .withColumn("_kept", kept)
        .select(
            *[
                F.concat_ws(
                    " ", F.expr("transform(_kept, p -> p.w)")
                ).alias(text_col)
                if c == text_col
                else F.col(c)
                for c in out_cols
            ],
            (
                F.size(F.split(F.col(text_col), " ")) - F.size("_kept")
            ).cast("long").alias("n_removed_words"),
        )
    )


# --------------------------------------------------------------------------
# Cross-document boilerplate lines (C4 / RefinedWeb-style line dedup)
# --------------------------------------------------------------------------

def _norm_line(col):
    """Matching grain for line dedup: whitespace runs collapsed, THEN
    trimmed, then lowercased — cosmetic variants of the same
    boilerplate ("\\tSubscribe  to our newsletter\\r" vs "subscribe
    to our newsletter") must hash together.  Collapse must precede
    the trim: ``trim`` strips only spaces, so a tab/CR-edged line
    would otherwise normalize with residual ' ' padding (failing to
    match its clean twin) and a lone '\\t' separator would become
    ' ' — eligible for removal despite the blank-line contract."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def boilerplate_line_counts(
    docs: DataFrame, min_docs: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
    min_line_chars: int = 1,
) -> DataFrame:
    """→ ``(line, n_docs)``: normalized lines appearing in at least
    ``min_docs`` DISTINCT documents — the corpus's boilerplate
    inventory (nav menus, cookie banners, license footers), ordered
    nowhere (add your own sort; at corpus scale you'd top-k this).

    Counting grain is documents, not occurrences: a line repeated 50
    times inside ONE page is repetition (see
    ``functions/repetition.py``), not cross-document boilerplate.

    100 TB shape: one narrow line explode, one (line, doc) distinct
    shuffle, one map-side-combined count — the same topology as the
    decontamination gram count.  Lines shorter than
    ``min_line_chars`` after normalization (blank lines, stray
    punctuation) are excluded from counting entirely.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    norm = _norm_line(F.col("_raw"))
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "\n")).alias("_raw"),
        )
        .select(F.col(id_col), norm.alias("line"))
        .filter(F.length("line") >= min_line_chars)
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    docs: DataFrame, min_docs: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
    min_line_chars: int = 1,
) -> DataFrame:
    """Remove every line whose NORMALIZED form appears in at least
    ``min_docs`` distinct documents — all copies, from every document
    (the C4/RefinedWeb line-dedup policy; the cross-document sibling
    of :func:`trim_repeated_spans`, at line rather than n-gram
    grain).

    Output: the input columns with ``text_col`` rewritten to the
    surviving lines (original bytes, original order — normalization
    is only the MATCHING grain) plus ``n_removed_lines``.  Lines
    shorter than ``min_line_chars`` after normalization — blank
    separator lines above all — are never counted and never removed,
    so paragraph structure survives.

    100 TB shape: the flagged set is built from 8-byte ``xxhash64``
    line keys (narrow; hash collisions can over-remove with
    probability ~n²/2⁶⁴, the standard trade every hash-keyed dedup
    here makes), the corpus-side membership join is AQE-broadcastable
    when boilerplate is sparse, and the only doc-grain shuffle is the
    inherent reassembly groupBy.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    norm = _norm_line(F.col("line"))
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select(
        F.col(id_col), "pos", "line",
        F.xxhash64(norm).alias("_lh"),
        (F.length(norm) >= min_line_chars).alias("_el"),
    )
    flagged = (
        lines.filter("_el")
        .select("_lh", id_col)
        .distinct()
        .groupBy("_lh")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_docs)
        .select("_lh")
    )
    # remove only lines that are BOTH flagged and locally eligible:
    # membership is keyed on the hash, eligibility re-checked per line
    # so an (astronomically unlikely) collision with a short line
    # cannot delete structure the contract promises to keep
    kept = (
        lines.join(flagged.withColumn("_flag", F.lit(True)), "_lh", "left")
        .filter(~(F.col("_el") & F.col("_flag").isNotNull()))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.expr("transform(array_sort(collect_list(struct(pos, line))), s -> s.line)"),
        ).alias("_new_text"),
        F.count("*").alias("_n_kept"),
    )
    # NULL text stays NULL with a zero count (a NULL document is not
    # an empty one); fully-boilerplate docs empty to '' but never
    # disappear
    out_cols = docs.columns
    new_text = F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
        F.coalesce(F.col("_new_text"), F.lit(""))
    )
    n_removed = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.col("_n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))
    )
    return (
        docs.withColumn(
            "_n_lines", F.size(F.split(F.col(text_col), "\n"))
        )
        .join(rebuilt, id_col, "left")
        .select(
            *[
                new_text.alias(text_col) if c == text_col else F.col(c)
                for c in out_cols
            ],
            n_removed.cast("long").alias("n_removed_lines"),
        )
    )


# --------------------------------------------------------------------------
# Three-sentence-span dedup (the C4 rule)
# --------------------------------------------------------------------------

#: engine-wide native sentence rule: a piece is a (possibly empty)
#: run of non-terminal chars plus its terminator run, or the
#: unterminated tail — so the pieces CONCATENATE back to the original
#: text exactly (whitespace rides inside pieces), and no piece is
#: empty.  A regex rule, not a learned segmenter (C4 uses NLTK punkt;
#: a model is out of scope here and the rule is stated) — portable
#: between the JVM and RE2 (no lookarounds, no escapes that differ).
SENTENCE_PATTERN = "[^.!?]*[.!?]+|[^.!?]+$"


def sentence_array(col) -> F.Column:
    """``col`` split into sentence pieces (``array<string>``) under
    :data:`SENTENCE_PATTERN` — native ``regexp_extract_all`` (group
    0 = whole match), NULL text → NULL, empty text → empty array.
    ``array_join(sentence_array(c), '')`` is ``c`` verbatim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(SENTENCE_PATTERN), F.lit(0))


def dedup_sentence_spans(
    docs: DataFrame, n: int = 3, min_count: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Remove all but ONE occurrence of any ``n``-sentence span
    repeated ``min_count``+ times across the corpus — the C4 rule
    (Raffel et al. 2020: "we discard all but one of any
    three-sentence span occurring more than once"), the keep-first
    complement of :func:`trim_repeated_spans`' remove-every-copy
    ExactSubstr policy.

    Semantics (stated; single pass over the ORIGINAL text):

    * sentences are :data:`SENTENCE_PATTERN` pieces; spans are keyed
      on the md5 of the span text lowercased and
      whitespace-normalized (portable ASCII class), so trailing
      spaces / case cannot split a key;
    * the KEPT occurrence is the globally first — min
      ``struct(id_col, start_idx)`` — deterministic under any
      partitioning;
    * every other occurrence's ``n`` sentences are removed; within a
      document, overlapping losing spans remove the UNION of their
      sentences (and may remove a sentence that also belongs to some
      winning span — the stated deterministic resolution; a
      streaming implementation is order-dependent here, this one is
      not);
    * documents keep their byte layout for surviving sentences (the
      pieces concatenate verbatim); NULL text stays NULL.

    100 TB shape: one narrow sentence explode; span keys via
    ``lead()`` over the doc partition (ONE shuffle on the doc id —
    sentences of a doc co-locate); the repeated-key rollup is one
    map-side-combined groupBy on the span key, and it is SPARSE in
    healthy corpora, so AQE broadcasts the join back; coverage and
    reassembly are doc-grain (``collect_list`` state bounded by the
    document's own sentence count, the boilerplate-lines bound).
    Reference: no counterpart — engine extension (SURVEY.md §2.12)."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"dedup_sentence_spans: n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(
            "dedup_sentence_spans: min_count must be >= 2 — at 1 "
            f"every span matches itself, got {min_count}"
        )
    sents = docs.select(
        id_col,
        F.posexplode(sentence_array(text_col)).alias("_idx", "_piece"),
    )
    w = Window.partitionBy(id_col).orderBy("_idx")
    span_txt = F.concat(
        *[
            F.coalesce(F.lead("_piece", i).over(w), F.lit(""))
            if i else F.col("_piece")
            for i in range(n)
        ]
    )
    occ = (
        sents
        .withColumn("_last", F.lead("_piece", n - 1).over(w))
        .withColumn(
            "_key",
            F.md5(
                F.lower(
                    F.btrim(
                        F.regexp_replace(
                            span_txt, "[ \t\n\r\f\v]+", " "
                        )
                    )
                )
            ),
        )
        # only full n-sentence windows form spans
        .filter(F.col("_last").isNotNull())
        .select(id_col, "_idx", "_key")
    )
    dup = (
        occ.groupBy("_key")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min(F.struct(F.col(id_col), F.col("_idx"))).alias("_win"),
        )
        .filter(F.col("_cnt") >= min_count)
        .select("_key", "_win")
    )
    cov = (
        occ.join(dup, "_key")
        .filter(
            ~(
                (F.col(id_col) == F.col("_win")[id_col])
                & (F.col("_idx") == F.col("_win._idx"))
            )
        )
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("_idx"), F.col("_idx") + F.lit(n - 1))
            ).alias("_cut"),
        )
        .distinct()
    )
    kept = sents.join(
        cov,
        on=[
            sents[id_col] == cov[id_col],
            sents["_idx"] == cov["_cut"],
        ],
        how="left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list("
                "struct(_idx, _piece))), x -> x._piece)"
            ),
            "",
        ).alias("_new_text"),
    )
    # removed count from the (sparse) coverage rows — NOT a second
    # sentence-regex pass over every document (r13 review: the regex
    # scan is the expensive step and already ran once in `sents`)
    removed = cov.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_rm")
    )
    out_cols = docs.columns
    new_text = F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
        F.coalesce(F.col("_new_text"), F.lit(""))
    )
    n_removed = F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
        F.coalesce(F.col("_n_rm"), F.lit(0))
    )
    return (
        docs.join(rebuilt, id_col, "left")
        .join(removed, id_col, "left")
        .select(
            *[
                new_text.alias(text_col) if c == text_col else F.col(c)
                for c in out_cols
            ],
            n_removed.cast("long").alias("n_removed_sentences"),
        )
    )
