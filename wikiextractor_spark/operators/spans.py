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
    from pyspark.sql import Window

    # ONE shuffle of the exploded corpus: a per-gram window count in
    # place of groupBy + semi-join, which would shuffle the same
    # exploded rows twice (once to count, once to join the counts
    # back) — at 100 TB the exploded set is the dominant volume, so
    # halving its shuffles halves the operator's network cost
    pos = _gram_positions(docs, n, text_col, id_col)
    w = Window.partitionBy("gram_hash")
    return (
        pos.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") >= min_count)
        .select(id_col, "pos")
    )


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
