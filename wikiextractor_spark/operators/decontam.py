"""Benchmark decontamination for LLM training data: flag and remove
corpus documents that overlap an evaluation set.

The standard recipe (used for GPT-3/PaLM-style training-set hygiene):
normalize text, take every ``n``-gram (n=13 by default), and call a
document contaminated when the fraction of its n-grams that also
appear anywhere in the benchmark set exceeds a threshold.

100 TB shape
------------
* The corpus side is ONE narrow pass: normalize + split + hash each
  n-gram with ``xxhash64`` (JVM, whole-stage codegen — no Python, no
  crypto hash), explode, and carry ``n_grams`` through the explode so
  the document grain never has to be recomputed or re-joined.
* The benchmark side is tiny by construction (eval sets are MBs
  against a 100 TB corpus), so its distinct gram-hash set is
  **broadcast**: the gram match is a BroadcastHashJoin — no shuffle
  of the exploded corpus.
* The only shuffle is the per-document rollup, keyed on the doc id
  with map-side partial aggregation.

Documents shorter than ``n`` words contribute their full word
sequence as a single gram, so short docs that literally equal a short
benchmark item still match (fraction 1.0) instead of silently having
zero grams.

No reference counterpart (`/root/reference/WikiExtractor.py` has no
dedup/decontamination surface) — this is part of the engine's
training-data-pipeline extension (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _norm_words_sql(text_col: str) -> str:
    """Lowercase, strip non-alphanumerics, collapse runs → word array."""
    return (
        f"split(trim(regexp_replace(lower({text_col}), "
        f"'[^a-z0-9]+', ' ')), ' ')"
    )


def _grams_expr(text_col: str, n: int) -> F.Column:
    """Array of xxhash64'd word ``n``-grams; whole doc when shorter
    than ``n`` words.  The split is bound once per row via the
    one-element-array idiom (see dedup._shingles_sql)."""
    return F.expr(
        f"""
        transform(array({_norm_words_sql(text_col)}), ws ->
          CASE WHEN size(ws) < {n}
               THEN array(xxhash64(concat_ws(' ', ws)))
               ELSE transform(sequence(0, size(ws) - {n}),
                              i -> xxhash64(concat_ws(' ', slice(ws, i + 1, {n}))))
          END)[0]
        """
    )


def doc_ngram_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """→ ``(id_col, n_grams, gram_hash)``: one row per normalized
    word ``n``-gram, hashed to a bigint.  ``n_grams`` (the document's
    total gram count) rides along so downstream rollups never need a
    second pass over the text.
    """
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    # bind the split once via the one-element-array idiom
    # (see dedup._shingles_sql): ws is evaluated a single time per row
    return _explode_with_count(df, text_col, id_col, n)


def _explode_with_count(
    df: DataFrame, text_col: str, id_col: str, n: int,
) -> DataFrame:
    """``(id, n_grams, gram_hash)`` with the gram array materialized
    in its own projection first — referencing the array expression
    directly from both ``size`` and ``explode`` in one select would
    evaluate the full hashing pass twice per row (CollapseProject
    declines to merge these, keeping one evaluation).

    ``explode_outer`` rather than ``explode``: plain explode plants an
    implicit ``size(e) > 0 AND isnotnull(e)`` filter that gets pushed
    below the projection and re-evaluates the whole hashing expression
    two more times per row (plan-verified).  The gram array is never
    empty — docs shorter than ``n`` words emit one whole-doc gram — so
    the outer variant is semantically identical and 3× cheaper."""
    return (
        df.select(F.col(id_col), _grams_expr(text_col, n).alias("_grams"))
        .select(
            F.col(id_col),
            F.size("_grams").alias("n_grams"),
            F.explode_outer("_grams").alias("gram_hash"),
        )
    )


def benchmark_gram_set(
    benchmark: DataFrame, text_col: str = "text", n: int = 13,
) -> DataFrame:
    """Distinct gram hashes of the benchmark set — the broadcast side."""
    grams = _grams_expr(text_col, n)
    return (
        benchmark.select(F.explode(grams).alias("gram_hash")).distinct()
    )


def contamination_report(
    docs: DataFrame, benchmark: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    n: int = 13, threshold: float = 0.1,
) -> DataFrame:
    """→ ``(id_col, n_grams, n_hits, hit_frac, contaminated)`` per
    document: how many of its ``n``-grams appear in the benchmark.

    One corpus pass, one broadcast join, one rollup shuffle.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"need 0 < threshold <= 1, got {threshold}")
    bench = F.broadcast(
        benchmark_gram_set(benchmark, text_col=text_col, n=n)
        .withColumn("_hit", F.lit(1))
    )
    # carry n_grams through the explode: the doc grain is rebuilt by
    # the rollup itself — no second scan, no self-join
    exploded = _explode_with_count(docs, text_col, id_col, n)
    return (
        exploded.join(bench, "gram_hash", "left")
        .groupBy(id_col, "n_grams")
        .agg(F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hits"))
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            "n_hits",
            (F.col("n_hits") / F.col("n_grams")).alias("hit_frac"),
            (F.col("n_hits") / F.col("n_grams") >= threshold).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame, benchmark: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    n: int = 13, threshold: float = 0.1,
) -> DataFrame:
    """Drop contaminated documents: ``docs`` minus every row whose
    benchmark ``n``-gram overlap fraction reaches ``threshold``.

    The flagged-id list is usually small (contamination is rare), so
    the anti-join is AQE-broadcastable at runtime; the corpus is
    touched exactly twice (flag pass + anti-join probe).
    """
    flagged = (
        contamination_report(
            docs, benchmark, text_col=text_col, id_col=id_col,
            n=n, threshold=threshold,
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")
