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
* FIT is ONE map-side-combined aggregation: doc count, total doc
  length, and every query-term document frequency come out of the
  same pass over the once-bound word array (one ``count_if`` per
  fitted term), so the fit is one corpus scan and the shuffle payload
  is one partial-agg row per task.  No corpus-wide inverted index is
  materialized — query term sets are small by the ``MAX_FIT_TERMS``
  contract.  For a STANDING index that serves ad-hoc queries,
  :func:`fit_bm25_index` aggregates every term's document frequency
  in one map-side-combined shuffle under the capped-vocab
  ``MAX_INDEX_TERMS`` raise-don't-spill contract; the scoring path is
  shared.
* The model is DRIVER-SIZED by construction (one idf per fitted
  term); scoring is one narrow projection — the word array binds
  ONCE per row (the decontam one-element-array idiom) and every
  per-term count, the length norm, and the integer sum evaluate
  inside that single lambda: zero joins, zero shuffles, one
  normalization pass per row no matter how many terms.
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
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from wikiextractor_spark.operators.decontam import _norm_words_sql

_MICRO = 1_000_000

#: fit cap: the model is collected to the driver and its idf values
#: inline as literals into the scoring expression — one expression
#: node per term, so the term set must stay small (queries are).
MAX_FIT_TERMS = 1024

#: standing-index cap (:func:`fit_bm25_index`): the whole surviving
#: vocabulary is collected to the driver, so the fit RAISES past this
#: bound instead of silently spilling (the DSIR ``MAX_BUCKETS``
#: contract) — raise ``max_terms`` explicitly for a wider corpus
#: after checking the driver can hold it.  Scoring cost is unchanged:
#: only the QUERY's terms inline into the expression.
MAX_INDEX_TERMS = 65536

# a term that the normalized word grammar can never produce (upper
# case, multi-word, punctuation, empty) would silently fit df=0 and
# score 0 everywhere — raise instead
_TERM_RE = re.compile(r"[a-z0-9]+\Z")


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
    #: True iff ``df`` covers EVERY corpus term (an index fit with
    #: min_df=1) — the precondition for :func:`update_bm25_index`,
    #: whose merge is only refit-equal when no tail was discarded
    complete: bool = False


def _words_col(text_col: str) -> Column:
    return F.expr(_norm_words_sql(text_col))


def idf_micro_of(n_docs: int, df_t: int) -> int:
    """Lucene-style non-negative idf, quantized: ``round(1e6 ·
    ln(1 + (N − df + 0.5)/(df + 0.5)))`` with HALF-AWAY rounding —
    Python's built-in ``round`` is half-to-even, but the DuckDB
    oracle's ``ROUND`` (and Spark's ``F.round``) are half-away, and
    the quantization must agree across engines at an exact .5."""
    x = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)) * _MICRO
    return math.floor(x + 0.5)  # x >= 0 always (df <= N)


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
    many queries share it.

    NULL-text rows are excluded from the fitted population: they can
    never be scored (NULL score), so counting them in ``n_docs``
    while their length is absent from ``total_dl`` would inflate N
    and deflate avgdl relative to the scorable corpus (r11 ADVICE)."""
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
    bad = [t for t in terms if not _TERM_RE.fullmatch(t)]
    if bad:
        raise ValueError(
            f"terms must be single normalized words ([a-z0-9]+) — "
            f"these can never match the word grammar: {bad}"
        )
    stats = (
        df.select(_words_col(text_col).alias("_ws"))
        .agg(
            # count("_ws"), not count(*): n_docs and total_dl must
            # describe the same population — NULL-text rows have a
            # NULL word array, which the sum already skips
            F.count("_ws").alias("n"),
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
        raise ValueError(
            "cannot fit BM25: no documents with non-NULL text"
        )
    df_map = {t: int(stats[f"_df{i}"]) for i, t in enumerate(terms)}
    return BM25Model(
        n_docs=n_docs,
        total_dl=total_dl,
        k1=float(k1),
        b=float(b),
        idf_micro={t: idf_micro_of(n_docs, df_map[t]) for t in terms},
        df=df_map,
    )


def fit_bm25_index(
    df: DataFrame, text_col: str = "text",
    k1: float = 1.2, b: float = 0.75,
    min_df: int = 1, max_terms: int = MAX_INDEX_TERMS,
) -> BM25Model:
    """Standing-index fit: corpus stats plus the document frequency of
    EVERY normalized term, so any ad-hoc query over the corpus scores
    without a refit (``fit_bm25`` needs the query terms up front).

    One corpus scan, one shuffle: each document emits its DISTINCT
    words plus one NULL sentinel row carrying the document length, and
    a single map-side-combined ``groupBy(term)`` yields both the
    per-term df (non-NULL groups) and the corpus stats (the sentinel
    group: its count is ``n_docs``, its length sum is ``total_dl``) —
    no second job, no join.  NULL-text rows are excluded from the
    population, same convention as :func:`fit_bm25`.

    Driver-size contract: the surviving vocabulary (``df >= min_df``,
    empty-string artifacts dropped) is collected, so the fit RAISES
    when it exceeds ``max_terms`` (default :data:`MAX_INDEX_TERMS`)
    rather than silently spilling — the collect itself is bounded by
    ``limit(max_terms + 2)``, so even the failing probe never ships
    an unbounded vocabulary to the driver.  ``min_df`` is the standard
    index-size lever (hapax terms dominate a Zipfian vocabulary but
    carry near-zero retrieval value).

    Scoring a term absent from the index still raises (same contract
    as the query fit): under ``min_df > 1`` that includes real but
    rare corpus terms — refit with a lower ``min_df`` if ad-hoc
    queries must cover the long tail."""
    if k1 <= 0 or not 0 <= b <= 1:
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got {k1}, {b}")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if max_terms < 1:
        raise ValueError(f"max_terms must be >= 1, got {max_terms}")
    grouped = (
        df.select(_words_col(text_col).alias("_ws"))
        .where(F.col("_ws").isNotNull())
        .select(
            F.explode(
                F.concat(
                    F.array(F.lit(None).cast("string")),
                    F.array_distinct("_ws"),
                )
            ).alias("term"),
            F.size("_ws").alias("dl"),
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df_t"),
            F.sum("dl").alias("sum_dl"),
        )
        .where(
            F.col("term").isNull()
            | ((F.col("term") != "") & (F.col("df_t") >= min_df))
        )
    )
    rows = grouped.limit(max_terms + 2).collect()
    sentinel = [r for r in rows if r["term"] is None]
    term_rows = [r for r in rows if r["term"] is not None]
    if len(term_rows) > max_terms:
        raise ValueError(
            f"surviving vocabulary exceeds max_terms={max_terms} — "
            "raise min_df or max_terms explicitly (the index is "
            "collected to the driver)"
        )
    if not sentinel:
        raise ValueError(
            "cannot fit BM25: no documents with non-NULL text"
        )
    n_docs = int(sentinel[0]["df_t"])
    total_dl = int(sentinel[0]["sum_dl"])
    df_map = {r["term"]: int(r["df_t"]) for r in term_rows}
    return BM25Model(
        n_docs=n_docs,
        total_dl=total_dl,
        k1=float(k1),
        b=float(b),
        idf_micro={t: idf_micro_of(n_docs, d) for t, d in df_map.items()},
        df=df_map,
        complete=(min_df == 1),
    )


def bm25_score_column(
    model: BM25Model, terms: list[str], text_col: str = "text",
) -> Column:
    """Per-document BM25 score for one query, in integer micro-units
    — a single narrow expression.  The word array binds ONCE per row
    via the one-element-array idiom (decontam/dsir precedent): the
    per-term filters are higher-order functions, which codegen cannot
    subexpression-eliminate, so referencing the split from each term
    would re-run the regex normalization per term per row.  NULL
    text → NULL score, so threshold/rank consumers drop it."""
    missing = [t for t in terms if t not in model.idf_micro]
    if missing:
        raise ValueError(
            f"terms not in the fitted model: {missing} — refit with "
            "the union of all query terms"
        )
    if not terms:
        raise ValueError("empty query")

    def _score_of(ws):
        dl = F.size(ws).cast("double")
        # identical association on both engines:
        # 1 − b + b·(dl·N)/total
        norm = (
            F.lit(1.0 - model.b)
            + F.lit(model.b)
            * (dl * F.lit(model.n_docs))
            / F.lit(model.total_dl)
        )
        total = None
        for t in dict.fromkeys(terms):
            tf = F.size(F.filter(ws, lambda w: w == F.lit(t))).cast(
                "double"
            )
            contrib = F.round(
                F.lit(model.idf_micro[t])
                * (tf * F.lit(model.k1 + 1.0))
                / (tf + F.lit(model.k1) * norm)
            ).cast("long")
            total = contrib if total is None else total + contrib
        return total

    return F.transform(F.array(_words_col(text_col)), _score_of)[0]



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
    TakeOrderedAndProject — per-partition heaps, no full sort.
    NULL-scored rows (NULL text — unscorable, not low-scoring) are
    filtered out, so the result never pads with NULLs when ``k``
    exceeds the scorable document count (r11 ADVICE)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        bm25_scores(df, model, terms, text_col, out_col)
        .where(F.col(out_col).isNotNull())
        .orderBy(F.col(out_col).desc(), F.col(id_col))
        .limit(k)
    )


def update_bm25_index(
    model: BM25Model, new_docs: DataFrame, text_col: str = "text",
    max_terms: int = MAX_INDEX_TERMS,
) -> BM25Model:
    """Merge a batch of NEW documents into a standing index — the
    lexical sibling of the ANN index's streaming maintenance, under
    the same law: ``update_bm25_index(fit_bm25_index(A), B)`` equals
    ``fit_bm25_index(A ∪ B)`` EXACTLY (df and the corpus stats are
    additive; idf re-derives from the merged stats), pinned by
    pytest and by the battery (the 'bm25_index' rows flow through an
    updated index whose oracle re-derives df over the full corpus).

    Requires a COMPLETE model (an index fit with ``min_df=1``):
    a ``min_df > 1`` fit discarded the tail's frequencies at fit
    time, so no update can reproduce the refit — it raises instead
    of silently drifting.  A query fit (:func:`fit_bm25`) likewise
    raises: its df covers only the query terms.  Downstream
    ``min_df`` cuts belong at SERVE time (filter the vocabulary),
    not in the standing state.

    A batch with zero non-NULL-text documents is a legal no-op and
    returns an equal model (micro-batches may be empty; the fit's
    raise-on-empty is a corpus-level contract, not a batch-level
    one).  Cost: ONE scan of the new batch (the fit's
    distinct-words + NULL-sentinel shuffle), a bounded
    ``limit(max_terms + 2)`` probe collect, and a driver-side merge
    — the standing corpus is never rescanned."""
    if not model.complete:
        raise ValueError(
            "update_bm25_index: the model does not carry the full "
            "corpus vocabulary (a min_df>1 index fit or a query "
            "fit) — the discarded tail makes an incremental merge "
            "unequal to a refit; fit the standing index with "
            "min_df=1"
        )
    if max_terms < 1:
        raise ValueError(f"max_terms must be >= 1, got {max_terms}")
    grouped = (
        new_docs.select(_words_col(text_col).alias("_ws"))
        .where(F.col("_ws").isNotNull())
        .select(
            F.explode(
                F.concat(
                    F.array(F.lit(None).cast("string")),
                    F.array_distinct("_ws"),
                )
            ).alias("term"),
            F.size("_ws").alias("dl"),
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df_t"),
            F.sum("dl").alias("sum_dl"),
        )
        .where(F.col("term").isNull() | (F.col("term") != ""))
    )
    rows = grouped.limit(max_terms + 2).collect()
    sentinel = [r for r in rows if r["term"] is None]
    term_rows = [r for r in rows if r["term"] is not None]
    if len(term_rows) > max_terms:
        raise ValueError(
            f"new batch vocabulary exceeds max_terms={max_terms} — "
            "the merged index could not fit either; raise max_terms "
            "explicitly (the index is collected to the driver)"
        )
    if not sentinel:
        # no scorable documents in the batch: a legal empty
        # micro-batch — return an equal standing model
        return BM25Model(
            n_docs=model.n_docs, total_dl=model.total_dl,
            k1=model.k1, b=model.b,
            idf_micro=dict(model.idf_micro), df=dict(model.df),
            complete=True,
        )
    n_docs = model.n_docs + int(sentinel[0]["df_t"])
    total_dl = model.total_dl + int(sentinel[0]["sum_dl"])
    merged = dict(model.df)
    for r in term_rows:
        merged[r["term"]] = merged.get(r["term"], 0) + int(r["df_t"])
    if len(merged) > max_terms:
        raise ValueError(
            f"merged vocabulary {len(merged)} exceeds "
            f"max_terms={max_terms} — raise max_terms explicitly "
            "(the index is collected to the driver)"
        )
    return BM25Model(
        n_docs=n_docs,
        total_dl=total_dl,
        k1=model.k1,
        b=model.b,
        idf_micro={t: idf_micro_of(n_docs, d) for t, d in merged.items()},
        df=merged,
        complete=True,
    )
