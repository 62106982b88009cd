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
