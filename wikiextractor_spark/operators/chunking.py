"""Document chunking for LLM training-data prep: split each document
into fixed-size token windows with overlap.

Pure narrow higher-order expressions — zero shuffle, zero Python —
so it runs at scan speed on 100 TB: ``split`` once per row (bound
through the one-element-array idiom, see dedup._shingles_sql), a
``sequence``-driven ``transform`` producing (chunk_no, chunk)
structs, then ``explode``.

Chunk count: 1 when the document fits in one chunk, else
``ceil((n_words - overlap) / step)`` with ``step = chunk - overlap``
— integer math identical in Spark and DuckDB so the battery oracle
can reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    chunk_tokens: int = 64, overlap: int = 16,
) -> DataFrame:
    """→ ``(id, chunk_no, chunk, n_tokens)``: whitespace-token windows
    of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap
    chunks = F.expr(
        f"""
        transform(array(split({text_col}, ' ')), ws ->
          transform(
            sequence(0,
              (CASE WHEN size(ws) <= {chunk_tokens} THEN 1
                    ELSE ((size(ws) - {overlap}) + {step} - 1) DIV {step}
               END) - 1),
            i -> struct(
              i AS chunk_no,
              concat_ws(' ', slice(ws, i * {step} + 1, {chunk_tokens})) AS chunk,
              least({chunk_tokens}, size(ws) - i * {step}) AS n_toks
            )))[0]
        """
    )
    # n_tokens is pure arithmetic — each window holds
    # min(chunk_tokens, words remaining) tokens, so re-splitting the
    # emitted chunk (a regex split per output row on an otherwise
    # scan-speed operator) is never needed
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_no").cast("long").alias("chunk_no"),
            F.col("c.chunk").alias("chunk"),
            F.col("c.n_toks").cast("long").alias("n_tokens"),
        )
    )


def chunk_token_ids(
    df: DataFrame, ids_col: str = "token_ids", id_col: str = "doc_id",
    chunk_tokens: int = 2048, overlap: int = 0,
) -> DataFrame:
    """→ ``(id, chunk_no, token_ids, n_tokens)``: fixed-size windows
    over a tokenized id stream (:func:`~wikiextractor_spark.functions.
    tokenizer.bpe_token_ids`) — context-window chunking at MODEL-token
    grain, where :func:`chunk_documents` windows whitespace words.
    The alternative to :func:`~wikiextractor_spark.operators.packing.
    assemble_packs` when each training sequence must come from ONE
    document (no cross-document attention) rather than packing many
    short documents per sequence.

    Same shape and arithmetic as :func:`chunk_documents`: zero
    shuffle, zero Python, ``slice``-driven windows advancing by
    ``chunk_tokens - overlap``, chunk count 1 when the stream fits.
    An EMPTY stream emits one empty chunk (the document survives with
    zero tokens, mirroring chunk_documents' empty-text row); a NULL
    stream emits no rows (explode of NULL) — gate NULL-text upstream
    as everywhere else."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap
    chunks = F.expr(
        f"""
        transform(array({ids_col}), ids ->
          transform(
            sequence(0,
              (CASE WHEN size(ids) <= {chunk_tokens} THEN 1
                    ELSE ((size(ids) - {overlap}) + {step} - 1) DIV {step}
               END) - 1),
            i -> struct(
              i AS chunk_no,
              slice(ids, i * {step} + 1, {chunk_tokens}) AS ids,
              least({chunk_tokens}, size(ids) - i * {step}) AS n_toks
            )))[0]
        """
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_no").cast("long").alias("chunk_no"),
            F.col("c.ids").alias("token_ids"),
            F.col("c.n_toks").cast("long").alias("n_tokens"),
        )
    )


def chunk_sentences(
    df: DataFrame, budget_words: int = 200,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(id_col, chunk_no, chunk, n_words, n_sentences,
    over_budget)``: the document split into chunks of CONSECUTIVE
    SENTENCES, greedily filled up to ``budget_words`` whitespace
    words per chunk — the boundary-respecting alternative to
    :func:`chunk_documents`' fixed windows (RAG corpora and
    eval-context prep want chunks that never cut mid-sentence).

    Rules (deterministic, stated): sentences are
    :func:`~wikiextractor_spark.operators.spans.sentence_array`
    pieces (which concatenate back verbatim, so each chunk keeps its
    byte layout and the chunks of a doc concatenate to the original
    text — pinned by pytest); a sentence joins the current chunk iff
    the chunk stays within budget, else it OPENS a new chunk; a
    single sentence longer than the budget becomes its own chunk
    with ``over_budget`` true (whole sentences are never split —
    that is the point; cut oversize outliers upstream if hard caps
    matter).  A ZERO-word piece (a pure-whitespace run — note a
    punctuation run like ``'..!!'`` counts as ONE word) follows the
    same merge rule as any sentence: it joins the current chunk when
    that chunk is within budget, but after an over-budget sentence
    it opens its own degenerate whitespace chunk (stated — the rule
    stays uniform; filter ``n_words = 0`` rows downstream if such
    input occurs).  NULL-text documents emit no rows (they have
    no sentences); empty text emits none either.

    100 TB shape: ONE narrow per-document projection — the greedy
    fill is a native ``aggregate`` fold over the sentence array
    (the interval-merge pattern), then one ``posexplode``; no
    shuffle, no Python."""
    # the LITERAL-controls form, NOT WS_SPLIT_PATTERN: the JVM eats
    # unknown escapes in SQL literals and reads \v as vertical-
    # whitespace — tokenizer.py's documented splice discipline
    from wikiextractor_spark.functions.tokenizer import (
        WS_SPLIT_PATTERN_JVM,
    )
    from wikiextractor_spark.operators.spans import SENTENCE_PATTERN

    if budget_words < 1:
        raise ValueError(
            f"chunk_sentences: budget_words must be >= 1, got "
            f"{budget_words}"
        )
    chunks = F.expr(
        f"""
        aggregate(
          transform(
            regexp_extract_all({text_col}, '{SENTENCE_PATTERN}', 0),
            p -> named_struct(
              't', p,
              'w', size(filter(split(p, '{WS_SPLIT_PATTERN_JVM}'),
                               x -> x != '')))),
          CAST(array() AS ARRAY<STRUCT<t: STRING, w: INT, n: INT>>),
          (acc, s) -> CASE
            WHEN size(acc) > 0
                 AND element_at(acc, -1).w + s.w <= {budget_words}
            THEN concat(
              slice(acc, 1, size(acc) - 1),
              array(named_struct(
                't', element_at(acc, -1).t || s.t,
                'w', element_at(acc, -1).w + s.w,
                'n', element_at(acc, -1).n + 1)))
            ELSE concat(acc, array(named_struct(
              't', s.t, 'w', s.w, 'n', 1)))
          END)
        """
    )
    return (
        df.select(id_col, F.posexplode(chunks).alias("chunk_no", "_c"))
        .select(
            id_col,
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.col("_c.t").alias("chunk"),
            F.col("_c.w").cast("long").alias("n_words"),
            F.col("_c.n").cast("long").alias("n_sentences"),
            (F.col("_c.w") > F.lit(budget_words)).alias("over_budget"),
        )
    )
