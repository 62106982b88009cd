"""Corpus-LM quality scoring: the perplexity-proxy filter
(CCNet-style) a training pipeline runs between heuristic quality
gates and dedup.

A unigram language model is fitted ON THE CORPUS ITSELF (or a
reference corpus): per-token probabilities from global counts, with
out-of-vocabulary tokens floored.  Each document then scores as the
mean token log-probability — documents full of gibberish, boilerplate
codes, or the wrong register sit far below the corpus mode and can be
gated on a percentile.

100 TB shape
------------
* **Fit** is one token-count aggregate bounded to the top
  ``vocab_size`` tokens via the capped heavy-hitter pass (never a
  full distinct-token shuffle) plus one scalar total — the model is
  a driver-sized (token, logp) table no matter the corpus size.
* **Score** is narrow: explode tokens, broadcast-join the vocab
  (BroadcastHashJoin — no corpus shuffle), one per-doc mean rollup.
* The fitted model is a plain DataFrame, so it can be persisted and
  reused to score OTHER corpora (score a new crawl under the kept
  corpus's model — drift shows up as a score shift).

No reference counterpart (`/root/reference/WikiExtractor.py` has no
quality surface) — extension per SURVEY.md §2.12.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _tokens_sql(text_col: str) -> str:
    """The token expression as a SQL fragment, for call sites that
    nest it inside a larger ``F.expr`` (a Column's ``toString`` does
    NOT round-trip lambda variables into parseable SQL).  The column
    name is backtick-quoted so names needing escaping ('my text',
    'text-v2') keep working as they did under ``F.col``."""
    quoted = "`%s`" % text_col.replace("`", "``")
    return f"filter(split(lower({quoted}), '\\\\s+'), t -> t != '')"


def _tokens_expr(text_col: str):
    """Lowercased whitespace tokens (the same normalization the other
    text-analysis signals use), empties dropped."""
    return F.expr(_tokens_sql(text_col))


def _lm_floor_logp(lm: DataFrame, caller: str) -> float:
    """The model's OOV floor log-probability from its single
    NULL-token row — ONE implementation of the model-unpacking
    contract behind every scorer and the divergence tools, so the
    convention (and its error message) cannot drift between them."""
    rows = lm.filter(F.col("token").isNull()).collect()
    if len(rows) != 1:
        raise ValueError(
            f"{caller}: the model must carry exactly one NULL-token "
            "floor row (fit_unigram_lm / fit_bigram_lm / "
            "load_logprob_table all produce one)"
        )
    return float(rows[0]["logp"])


def fit_unigram_lm(
    docs: DataFrame, text_col: str = "text", vocab_size: int = 50_000,
    floor_logp: float | None = None,
) -> DataFrame:
    """→ ``(token, logp)`` for the ``vocab_size`` most frequent
    tokens, probabilities from global corpus counts.

    ``floor_logp`` (default: ``log(0.5 / total_tokens)`` — half a
    count) is attached to the special row ``token = NULL`` so scorers
    carry the OOV floor with the model instead of a side channel.

    Cost shape: the token total is tallied INSIDE the heavy-hitter
    candidate pass (:func:`heavy_hitters_with_total`), so fitting
    never pays a separate full ``count()`` scan; the candidate
    broadcast is hard-capped at ``2 × max(200, vocab_size)`` rows.
    Recall trade, stated: with cap = 2m the merge tree guarantees a
    candidate slot for any token with frequency
    > n/(m+1) + 2n/(2m+1) ≈ 2n/m (vs ≈ 1.125n/m at the 16×m
    default) — deliberate: vocab-boundary tokens near rank
    ``vocab_size`` carry log-probs within a fraction of a nat of the
    OOV floor, so their scoring impact is marginal while the 16×m
    broadcast (800k rows at vocab 50k) is not."""
    from wikiextractor_spark.operators.sketches import heavy_hitters_with_total

    exploded = docs.select(
        F.explode(_tokens_expr(text_col)).alias("token")
    )
    # per-task candidate cap scales with the vocab: m = vocab_size
    # keeps the MG recall bound at ~n/(vocab_size+1) while per-task
    # memory stays O(vocab_size + batch-distinct)
    topk, total = heavy_hitters_with_total(
        exploded, "token", k=vocab_size,
        candidates_per_partition=max(200, vocab_size),
        max_candidates=2 * max(200, vocab_size),
    )
    if total == 0:
        raise ValueError("fit_unigram_lm: corpus has no tokens")
    top = topk.select(
        F.col("value").alias("token"),
        F.log(F.col("n") / F.lit(float(total))).alias("logp"),
    )
    if floor_logp is None:
        floor_logp = math.log(0.5 / total)
    from wikiextractor_spark.localframe import local_rows_df

    floor_row = local_rows_df(
        docs.sparkSession,
        [(None, float(floor_logp))], "token string, logp double"
    )
    # materialize the (small) model NOW: every scoring call both
    # collects the floor row and broadcast-joins the vocab, and an
    # unmaterialized model would re-run the whole heavy-hitter fit per
    # use (and per micro-batch when passed into a stream)
    return top.unionByName(floor_row).localCheckpoint(eager=True)


def doc_logprob_scores(
    docs: DataFrame, lm: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(id_col, n_tokens, mean_logp)``: per-document mean token
    log-probability under the fitted model.  One narrow explode, one
    broadcast join on the vocab, one per-doc rollup — the corpus
    never shuffles on tokens."""
    floor = _lm_floor_logp(lm, "doc_logprob_scores")
    vocab = F.broadcast(lm.filter(F.col("token").isNotNull()))
    exploded = docs.select(
        F.col(id_col), F.explode(_tokens_expr(text_col)).alias("token")
    )
    return (
        exploded.join(vocab, "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.coalesce(F.col("logp"), F.lit(floor))).alias("mean_logp"),
        )
    )


def threshold_from_quantile(
    lm: DataFrame, docs: DataFrame, q: float,
    text_col: str = "text", id_col: str = "doc_id",
    relative_error: float = 0.01,
) -> float:
    """The ``min_mean_logp`` at quantile ``q`` of the corpus's score
    distribution — so a caller can say "drop the bottom 5%"
    (``q=0.05``) instead of hand-picking a log-probability.

    Uses ``approxQuantile`` (Greenwald-Khanna: one pass, driver state
    O(1/relative_error), no sort shuffle — the scale-correct way to
    get one percentile from a 100 TB score column).  Feed the result
    to :func:`filter_by_logprob`; since the gate keeps scores
    ``>= threshold``, it retains ≈ ``1 - q`` of the scored corpus
    (± relative_error, ties included)."""
    return threshold_from_quantile_scores(
        doc_logprob_scores(docs, lm, text_col, id_col), q,
        relative_error=relative_error,
    )


def filter_by_logprob(
    docs: DataFrame, lm: DataFrame, min_mean_logp: float,
    text_col: str = "text", id_col: str = "doc_id",
    keep_tokenless: bool = False,
) -> DataFrame:
    """Keep documents scoring at or above ``min_mean_logp`` under the
    model — the gate itself; pick the threshold from the score
    distribution (e.g. a low percentile of a trusted sample).

    Documents with ZERO tokens (empty/whitespace-only text) have no
    score; by default they are dropped — stated explicitly, because
    the join shape would otherwise do it silently — and
    ``keep_tokenless=True`` passes them through instead (defer their
    fate to a length gate)."""
    scores = doc_logprob_scores(docs, lm, text_col, id_col)
    keep = scores.filter(F.col("mean_logp") >= min_mean_logp).select(id_col)
    kept = docs.join(keep, id_col, "left_semi")
    if not keep_tokenless:
        return kept
    tokenless = docs.join(scores.select(id_col), id_col, "left_anti")
    return kept.unionByName(tokenless)


def perplexity_buckets(
    docs: DataFrame, lm: DataFrame,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    text_col: str = "text", id_col: str = "doc_id",
    relative_error: float = 0.01,
) -> DataFrame:
    """CCNet-style head/middle/tail split: label every document by
    where its LM score falls in the corpus score distribution —
    ``head`` = most-fluent third, ``tail`` = least — so downstream
    mixing can weight buckets instead of hard-dropping (the CCNet
    observation: the tail is noisier but not worthless).

    Scale shape: the two cut points come from ONE approxQuantile
    pass (driver gets two floats); labeling is then a narrow CASE
    over the scored join — no sort, no ntile window (a global ntile
    would funnel the corpus through a total order).  Documents with
    zero tokens have no score and get a NULL bucket (the same
    explicit no-score contract as :func:`filter_by_logprob`).

    Returns ``docs`` + ``mean_logp`` + ``ppx_bucket``.  ``cuts`` are
    the (lower, upper) quantiles of ``mean_logp``; note HIGHER
    mean_logp = LOWER perplexity = ``head``.
    """
    lo_q, hi_q = cuts
    if not 0.0 < lo_q <= hi_q < 1.0:
        raise ValueError(f"cuts must satisfy 0 < lo <= hi < 1, got {cuts}")
    # materialize the narrow (id, mean_logp) table: it feeds BOTH the
    # quantile action and the labeling join, and the scoring pass
    # (explode + broadcast vocab join + per-doc rollup) is the
    # expensive part — without this the corpus is scored twice
    scores = doc_logprob_scores(docs, lm, text_col, id_col).localCheckpoint(
        eager=True
    )
    got = scores.approxQuantile("mean_logp", [lo_q, hi_q], relative_error)
    if not got:
        raise ValueError("perplexity_buckets: corpus has no scored docs")
    lo, hi = float(got[0]), float(got[1])
    bucket = (
        F.when(F.col("mean_logp").isNull(), F.lit(None).cast("string"))
        .when(F.col("mean_logp") >= hi, F.lit("head"))
        .when(F.col("mean_logp") >= lo, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        docs.join(scores, id_col, "left")
        .withColumn("ppx_bucket", bucket)
    )


def fit_bigram_lm(
    docs: DataFrame, text_col: str = "text",
    vocab_size: int = 50_000, bigram_size: int = 200_000,
) -> tuple[DataFrame, DataFrame]:
    """→ ``(unigram_lm, bigram_table)``: one n-gram order up from
    :func:`fit_unigram_lm` (the CCNet direction — their production
    filter is a 5-gram KenLM; a corpus-fit interpolated bigram
    captures local word ORDER, which no unigram model can see).

    ``bigram_table`` is ``(w1, w2, logp_cond)`` for the
    ``bigram_size`` most frequent adjacent pairs, with
    ``logp_cond = log(c(w1,w2) / c(w1))`` — the ML conditional.
    Pairs whose ``w1`` falls outside the unigram vocabulary are
    dropped (their mass backs off to the unigram side at scoring).

    Cost shape: two bounded heavy-hitter passes — the unigram fit
    and a pair-grain pass — each of which reads the corpus twice
    (candidate sweep + exact recount, the sketches.py contract), so
    fitting costs FOUR corpus scans total; both models stay
    driver-sized tables regardless of corpus size.
    """
    from wikiextractor_spark.operators.sketches import heavy_hitters

    uni = fit_unigram_lm(docs, text_col, vocab_size)
    # unigram COUNTS (not logp) for the conditional's denominator:
    # re-derive from the model instead of a third scan — logp was
    # log(c/total), so c = exp(logp) * total; carry total via the
    # floor row's definition (floor = log(0.5/total))
    floor = float(
        uni.filter(F.col("token").isNull()).first()["logp"]
    )
    # both recoveries round to the INTEGER each value provably is
    # (token totals and counts): the exp/log round trips land within
    # 1e-16 relative of the true integer, and carrying that epsilon
    # into log(cp/c1) would make the conditional differ from an
    # exact-count restatement (the battery oracle) at the last ulp
    total = round(0.5 / math.exp(floor))
    uni_counts = uni.filter(F.col("token").isNotNull()).select(
        F.col("token").alias("w1"),
        F.round(F.exp(F.col("logp")) * F.lit(float(total))).alias("_c1"),
    )
    # adjacent pairs, length-prefix encoded ('<len(w1)>:<w1><w2>'):
    # a separator-based encoding is NOT collision-free — regex \s
    # does not match \x00, so a NUL can sit INSIDE a token and a
    # separator pair ('a\x00b','c') would collide with ('a','b\x00c');
    # the length prefix decodes unambiguously for any token bytes
    pairs = docs.select(
        F.explode(
            F.expr(
                # NB sequence(1, 0) is the DESCENDING [1, 0], not
                # empty — docs under 2 tokens need the explicit arm
                f"transform(array({_tokens_sql(text_col)}), ws -> "
                "CASE WHEN size(ws) < 2 THEN array() "
                "ELSE transform(sequence(1, size(ws) - 1), "
                "i -> concat(cast(length(ws[i - 1]) as string), ':', "
                "ws[i - 1], ws[i])) END)[0]"
            )
        ).alias("pair")
    )
    top_pairs = heavy_hitters(
        pairs, "pair", k=bigram_size,
        candidates_per_partition=max(200, bigram_size),
        max_candidates=2 * max(200, bigram_size),
    )
    # decode the length prefix: digits before the FIRST ':' are
    # len(w1) by construction (w1 itself may contain ':' — the
    # prefix tells us exactly where it ends, so no ambiguity)
    bigram = (
        top_pairs.select(
            F.expr(
                "substring(substring(value, "
                "length(split_part(value, ':', 1)) + 2), "
                "1, cast(split_part(value, ':', 1) as int))"
            ).alias("w1"),
            F.expr(
                "substring(substring(value, "
                "length(split_part(value, ':', 1)) + 2), "
                "cast(split_part(value, ':', 1) as int) + 1)"
            ).alias("w2"),
            F.col("n").alias("_cp"),
        )
        .join(F.broadcast(uni_counts), "w1")
        .select(
            "w1", "w2",
            F.log(F.col("_cp") / F.col("_c1")).alias("logp_cond"),
        )
        .localCheckpoint(eager=True)
    )
    return uni, bigram


def doc_logprob_scores_bigram(
    docs: DataFrame, uni_lm: DataFrame, bigram: DataFrame,
    lam: float = 0.7,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(id_col, n_tokens, mean_logp)`` under the interpolated
    bigram model: position 0 scores ``log(p_uni(w0))``; position i>0
    scores ``log(λ·p_ml(w_i|w_{i-1}) + (1−λ)·p_uni(w_i))`` —
    Jelinek-Mercer backoff, never zero because ``p_uni`` is floored.

    100 TB shape: ONE explode to (doc, prev, token) position grain,
    TWO broadcast joins (bigram table, unigram vocab), one per-doc
    rollup — the corpus never shuffles on tokens or pairs.  Shuffled
    word salad keeps its unigram score but loses here: word ORDER is
    exactly what the conditional term prices.
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    p_floor = math.exp(
        _lm_floor_logp(uni_lm, "doc_logprob_scores_bigram")
    )
    positions = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                # same sequence(1, 0) == [1, 0] trap: empty docs need
                # the explicit empty arm
                f"transform(array({_tokens_sql(text_col)}), ws -> "
                "CASE WHEN size(ws) = 0 THEN "
                "array() "
                "ELSE transform(sequence(1, size(ws)), i -> "
                "struct(CASE WHEN i = 1 THEN NULL ELSE ws[i - 2] END AS w1, "
                "ws[i - 1] AS w2)) END)[0]"
            )
        ).alias("_p"),
    ).select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    vocab = F.broadcast(
        uni_lm.filter(F.col("token").isNotNull()).select(
            F.col("token").alias("w2"), F.exp("logp").alias("_pu")
        )
    )
    joined = (
        positions.join(F.broadcast(bigram), ["w1", "w2"], "left")
        .join(vocab, "w2", "left")
        .select(
            id_col,
            F.when(
                F.col("w1").isNull(),
                F.log(F.coalesce(F.col("_pu"), F.lit(p_floor))),
            )
            .otherwise(
                F.log(
                    F.lit(lam)
                    * F.coalesce(F.exp("logp_cond"), F.lit(0.0))
                    + F.lit(1.0 - lam)
                    * F.coalesce(F.col("_pu"), F.lit(p_floor))
                )
            )
            .alias("_lp"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("_lp").alias("mean_logp"),
    )


def threshold_from_quantile_scores(
    scores: DataFrame, q: float,
    score_col: str = "mean_logp", relative_error: float = 0.01,
) -> float:
    """:func:`threshold_from_quantile` generalized to ANY score table
    (e.g. :func:`doc_logprob_scores_bigram` output, a classifier's
    logits): the value at quantile ``q`` of ``score_col``, one
    approxQuantile pass."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    got = scores.approxQuantile(score_col, [q], relative_error)
    if not got:
        raise ValueError(
            "threshold_from_quantile_scores: no scored rows"
        )
    return float(got[0])


# --------------------------------------------------------------------------
# External-model adapters: bring-your-own log-prob table
# --------------------------------------------------------------------------

def save_logprob_table(lm: DataFrame, path: str) -> None:
    """Persist a fitted ``(token, logp)`` model — including the
    NULL-token OOV floor row — as one parquet file, the round-trip
    sibling of :func:`load_logprob_table`.  The model is driver-sized
    by construction (vocab-capped), so one coalesced file keeps the
    reload a single-file read."""
    from wikiextractor_spark.functions.modelio import write_one_file

    write_one_file(lm.select("token", "logp"), path)


def load_logprob_table(
    spark, path: str, fmt: str | None = None,
    floor_logp: float | None = None,
) -> DataFrame:
    """Load a PRETRAINED token→log-prob table into the scoring paths
    (:func:`doc_logprob_scores`, :func:`filter_by_logprob`,
    :func:`perplexity_buckets`) — the CCNet-style workflow where the
    quality LM was trained elsewhere (a KenLM unigram dump, a
    published wiki LM) instead of corpus-fit here.

    Formats: ``parquet`` (columns ``token string, logp double``) or
    ``tsv`` (two tab-separated columns, no header — the classic
    ARPA-adjacent dump shape); ``fmt=None`` infers tsv from a
    ``.tsv``/``.txt`` suffix, parquet otherwise.

    The OOV floor: a parquet model may already carry the NULL-token
    floor row (:func:`fit_unigram_lm` writes one); a TSV cannot
    express it, so pass ``floor_logp``.  Supplying BOTH (or a
    floorless parquet without ``floor_logp``) raises — scoring with
    an accidental double/missing floor silently shifts every
    document's score.  Returns the model materialized, like
    :func:`fit_unigram_lm` (scorers re-use it per action and per
    micro-batch).

    Validation (shared with the classifier's weight loader via
    :mod:`modelio`, so the two contracts can never drift): malformed
    values raise, the floor must be supplied exactly once."""
    from wikiextractor_spark.functions.modelio import load_keyed_table

    table, floor = load_keyed_table(
        spark, path, fmt,
        key_col="token", key_type="string", value_col="logp",
        scalar_name="floor_logp", scalar=floor_logp,
        caller="load_logprob_table",
    )
    from wikiextractor_spark.localframe import local_rows_df

    floor_row = local_rows_df(
        spark, [(None, float(floor))], "token string, logp double"
    )
    return table.unionByName(floor_row).localCheckpoint(eager=True)


# --------------------------------------------------------------------------
# Corpus drift: divergence between two fitted unigram models
# --------------------------------------------------------------------------

def _lm_probs(lm: DataFrame, suffix: str):
    """(vocab rows as (token, p<suffix>), floor probability) of a
    fitted model — shared unpacking for the divergence tools."""
    floor = math.exp(_lm_floor_logp(lm, "lm divergence"))
    vocab = lm.filter(F.col("token").isNotNull()).select(
        "token", F.exp("logp").alias(f"p{suffix}")
    )
    return vocab, floor


def token_divergence(lm_a: DataFrame, lm_b: DataFrame) -> DataFrame:
    """→ ``(token, p_a, p_b, js_term)`` over the UNION of both
    vocabularies: each token's probability under both models (the
    other model's OOV floor where absent) and its contribution to
    the Jensen-Shannon divergence — the per-token drill-down behind
    :func:`lm_js_divergence`.  Sort descending on ``js_term`` for
    "which tokens drifted" (new spam vocabulary, a language shift, a
    boilerplate wave).

    Scale shape: one full-outer join of two driver-sized vocab
    tables (each capped by its fit's ``vocab_size``) — no corpus
    scan; drift monitoring on 100 TB costs whatever the two fits
    cost, which production runs amortize per snapshot anyway.

    Stated approximation: with OOV floors the two distributions are
    not exactly normalized, so the JS value is the floored-model
    divergence, not the true-corpus one — fine for MONITORING (the
    quantity is compared against its own history), stated so nobody
    publishes it as an information-theoretic measurement."""
    va, fa = _lm_probs(lm_a, "_a")
    vb, fb = _lm_probs(lm_b, "_b")
    joined = va.join(vb, "token", "full_outer").select(
        "token",
        F.coalesce("p_a", F.lit(fa)).alias("p_a"),
        F.coalesce("p_b", F.lit(fb)).alias("p_b"),
    )
    # js_term = 0.5·p_a·ln(p_a/m) + 0.5·p_b·ln(p_b/m), m = (p_a+p_b)/2
    return joined.withColumn(
        "js_term",
        0.5 * F.col("p_a")
        * F.log(F.col("p_a") / ((F.col("p_a") + F.col("p_b")) / 2))
        + 0.5 * F.col("p_b")
        * F.log(F.col("p_b") / ((F.col("p_a") + F.col("p_b")) / 2)),
    )


def lm_js_divergence(lm_a: DataFrame, lm_b: DataFrame) -> float:
    """Jensen-Shannon divergence (nats) between two fitted unigram
    models — the snapshot-over-snapshot drift alarm: 0 for identical
    corpora, ln(2) ≈ 0.693 for disjoint vocabularies.  One scalar
    aggregate over :func:`token_divergence`; see its docstring for
    the shape and the stated floor approximation."""
    row = token_divergence(lm_a, lm_b).agg(
        F.sum("js_term").alias("_js")
    ).first()
    # SUM over zero rows is NULL: two floor-only models (empty
    # vocabularies) have identical (floored) distributions — 0.0
    return 0.0 if row["_js"] is None else float(row["_js"])
