"""BM25 lexical retrieval scoring — the keyword-search complement to
the embedding ANN stack.

A training-data pipeline needs lexical retrieval for targeted corpus
audits ("show me the top documents for these terms"), seed-set
construction for DSIR-style selection, and contamination triage; the
engine's similarity search is embedding-based, and TF-IDF keywords
(`ta_term_stats`) rank terms per document — this module ranks
DOCUMENTS per query, the Okapi BM25 / Lucene formula:

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1)
                            / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

100 TB shape
------------
* FIT is two map-side-combined aggregations: one corpus-stats pass
  (doc count + total doc length) and one document-frequency pass for
  the QUERY TERMS ONLY — the distinct-term explode is filtered to the
  fitted term set BEFORE the shuffle, so the shuffle payload is at
  most |terms| rows per task.  No corpus-wide inverted index is
  materialized (for a standing index, persist the df pass unfiltered;
  the scoring path is unchanged).
* The model is DRIVER-SIZED by construction (one idf per fitted
  term); scoring is one narrow projection — per-term counts over the
  normalized word array, zero joins, zero shuffles, inside
  whole-stage codegen.
* Top-k is ``orderBy(...).limit(k)`` — Spark plans it as
  TakeOrderedAndProject: per-partition k-heaps merged on the driver,
  never a full sort or shuffle of the corpus.
* idf is QUANTIZED to integer micro-units at fit time and each
  per-term contribution is rounded to BIGINT micro-units before the
  per-document sum — integer addition is order-independent, so the
  score is exactly reproducible across partitionings and engines
  (the DSIR / money-aggregate integerize-first discipline).  The
  tf-normalization stays in double: IEEE +,−,×,÷ on identical
  operands are correctly rounded and therefore engine-identical; the
  only transcendental (ln) crosses once per TERM at fit time.

Normalization is the shared decontam/DSIR word definition, so
retrieval, dedup hygiene, and data selection agree on what a word
is.

No reference counterpart (`/root/reference/WikiExtractor.py` has no
retrieval surface) — engine extension (SURVEY.md §2.12).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from wikiextractor_spark.operators.decontam import _norm_words_sql

_MICRO = 1_000_000

#: fit cap: the model is collected to the driver and its idf values
#: inline as literals into the scoring expression — one expression
#: node per term, so the term set must stay small (queries are).
MAX_FIT_TERMS = 1024


@dataclass(frozen=True)
class BM25Model:
    """Driver-sized fit artifact: corpus stats + per-term (df,
    idf_micro).  ``k1``/``b`` ride along so scoring can't silently
    use different constants than documented at fit time."""

    n_docs: int
    total_dl: int
    k1: float = 1.2
    b: float = 0.75
    idf_micro: dict[str, int] = field(default_factory=dict)
    df: dict[str, int] = field(default_factory=dict)


def _words_col(text_col: str) -> Column:
    return F.expr(_norm_words_sql(text_col))


def idf_micro_of(n_docs: int, df_t: int) -> int:
    """Lucene-style non-negative idf, quantized: ``round(1e6 ·
    ln(1 + (N − df + 0.5)/(df + 0.5)))``."""
    return round(
        math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)) * _MICRO
    )


def fit_bm25(
    df: DataFrame, terms: list[str], text_col: str = "text",
    k1: float = 1.2, b: float = 0.75,
) -> BM25Model:
    """Fit corpus stats + idf for ``terms`` (the union of every query
    you intend to score — scoring a term outside the fitted set
    raises).  ONE map-side-combined aggregation job and one scalar
    collect: doc count, total length, and every per-term document
    frequency come out of the same pass (the word array binds once
    per row), so the fit cost is one corpus scan regardless of how
    many queries share it."""
    terms = list(dict.fromkeys(terms))  # de-dup, keep order
    if not terms:
        raise ValueError("need at least one term to fit")
    if len(terms) > MAX_FIT_TERMS:
        raise ValueError(
            f"{len(terms)} terms exceed MAX_FIT_TERMS={MAX_FIT_TERMS} "
            "(the model inlines one literal per term)"
        )
    if k1 <= 0 or not 0 <= b <= 1:
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got {k1}, {b}")
    stats = (
        df.select(_words_col(text_col).alias("_ws"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.size("_ws")), F.lit(0)).alias("tot"),
            *(
                F.count_if(F.array_contains("_ws", t)).alias(f"_df{i}")
                for i, t in enumerate(terms)
            ),
        )
        .collect()[0]
    )
    n_docs, total_dl = int(stats["n"]), int(stats["tot"])
    if n_docs == 0:
        raise ValueError("cannot fit BM25 on an empty corpus")
    df_map = {t: int(stats[f"_df{i}"]) for i, t in enumerate(terms)}
    return BM25Model(
        n_docs=n_docs,
        total_dl=total_dl,
        k1=float(k1),
        b=float(b),
        idf_micro={t: idf_micro_of(n_docs, df_map[t]) for t in terms},
        df=df_map,
    )


def bm25_score_column(
    model: BM25Model, terms: list[str], text_col: str = "text",
) -> Column:
    """Per-document BM25 score for one query, in integer micro-units
    — a single narrow expression (per-term array counts over the
    bound word array; no join, no shuffle, no Python).  NULL text →
    NULL score, so threshold/rank consumers drop it."""
    missing = [t for t in terms if t not in model.idf_micro]
    if missing:
        raise ValueError(
            f"terms not in the fitted model: {missing} — refit with "
            "the union of all query terms"
        )
    if not terms:
        raise ValueError("empty query")
    ws = _words_col(text_col)
    dl = F.size(ws).cast("double")
    # identical association on both engines: 1 − b + b·(dl·N)/total
    norm = (
        F.lit(1.0 - model.b)
        + F.lit(model.b) * (dl * F.lit(model.n_docs)) / F.lit(model.total_dl)
    )
    def _eq(term: str):
        # a closure, NOT a default-arg lambda: a two-parameter lambda
        # would be read by PySpark as the (element, index) form
        return lambda w: w == F.lit(term)

    total = None
    for t in dict.fromkeys(terms):
        tf = F.size(F.filter(ws, _eq(t))).cast("double")
        contrib = F.round(
            F.lit(model.idf_micro[t])
            * (tf * F.lit(model.k1 + 1.0))
            / (tf + F.lit(model.k1) * norm)
        ).cast("long")
        total = contrib if total is None else total + contrib
    return total


def bm25_scores(
    df: DataFrame, model: BM25Model, terms: list[str],
    text_col: str = "text", out_col: str = "bm25_micro",
) -> DataFrame:
    """Attach the query's BM25 score (integer micro-units) to every
    row."""
    return df.withColumn(out_col, bm25_score_column(model, terms, text_col))


def bm25_topk(
    df: DataFrame, model: BM25Model, terms: list[str], k: int,
    text_col: str = "text", id_col: str = "doc_id",
    out_col: str = "bm25_micro",
) -> DataFrame:
    """Top-``k`` documents for the query, ties broken by ``id_col``
    so the result is deterministic.  Planned as
    TakeOrderedAndProject — per-partition heaps, no full sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        bm25_scores(df, model, terms, text_col, out_col)
        .orderBy(F.col(out_col).desc(), F.col(id_col))
        .limit(k)
    )
