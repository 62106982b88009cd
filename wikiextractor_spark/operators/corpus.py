"""End-to-end training-corpus preparation: the canonical composition
of the engine's training-data operators into one declarative flow.

    raw documents
      → URL blocklist          (urls.filter_blocked_domains, broadcast)
      → language filter        (textstats.lang_id, native)
      → quality gate           (textstats.quality_score, native)
      → repetition gate        (repetition.is_repetitive, native)
      → Gopher shape rules     (gopher.passes_gopher_rules, native)
      → trained classifier     (classifier.gate_by_classifier, native)
      → content classifier     (classifier.score_hashed, broadcast join)
      → PII redaction          (pii.redact_pii, native)
      → boilerplate lines      (spans.remove_boilerplate_lines, C4-style)
      → dedup                  (exact hash-groupBy, LSH near-dup, or
                                SemDeDup semantic via embeddings)
      → decontaminate          (benchmark n-gram overlap, broadcast)
      → deterministic sample   (hash-gate, reproducible)
      → chunk                  (overlap windows, scan-speed)
      → pack                   (FFD token-budget packs)

Every stage is the already-tested operator, so this module adds no
new semantics — it pins the COMPOSITION: stage order (cheap narrow
filters before shuffling dedup; sample before chunk so the gate keys
on documents, not chunks) and the single place a user points at to go
from a raw corpus to training-ready sequences.

The whole flow is lazy: callers get one DataFrame whose plan Catalyst
optimizes end-to-end (the lang/quality filters reach the parquet scan
ahead of any shuffle).  Stated eager exceptions: ``token_budget``
(needs a measuring aggregate), near dedup (the LSH candidate sketch
materializes against projection collapse), semantic decontamination
(same sketch materialization), ``dedup='semantic'`` (centroid
fit + kept-embeddings checkpoint, which semantic_dedup would
otherwise re-derive per reference), and the DSIR gate's fit/collect
(``dsir_target`` runs two driver-sized histogram aggregations +
one bounded collect; pre-fitted ``dsir_weights`` DataFrames collect
once) — each runs its bounded job at composition time.

Contract: ``id_col`` values are assumed UNIQUE per document — the
whole module keys on them (hash-gate sampling, dedup survivors,
chunk-id packing, and the join-backed gates whose keep-id sets are
computed from the raw scan).  Feed duplicate ids through
``dedup_exact`` or re-keying first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from wikiextractor_spark.functions.pii import redact_pii
from wikiextractor_spark.functions.repetition import is_repetitive
from wikiextractor_spark.functions.textstats import lang_id, quality_score
from wikiextractor_spark.operators.chunking import chunk_documents
from wikiextractor_spark.operators import dsir
from wikiextractor_spark.operators.decontam import decontaminate
from wikiextractor_spark.operators.dedup import dedup_exact, dedup_near
from wikiextractor_spark.operators.packing import pack_sequences
from wikiextractor_spark.operators.sampling import (
    deterministic_sample,
    sample_token_budget,
)


def prepare_corpus(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    *,
    target_lang: str | None = None,
    langid_model=None,
    min_quality: float | None = None,
    drop_repetitive: bool = False,
    gopher: bool = False,
    url_blocklist: DataFrame | list | None = None,
    url_col: str = "url",
    classifier_model=None,
    classifier_threshold: float = 0.0,
    content_weights: tuple[DataFrame, float] | None = None,
    min_content_logit: float | None = None,
    content_hash_opts: dict | None = None,
    logprob_lm: DataFrame | None = None,
    min_mean_logp: float | None = None,
    dsir_target: DataFrame | None = None,
    dsir_weights: DataFrame | dsir.PrebuiltWeights | None = None,
    min_dsir_weight_micro: int | None = None,
    dsir_opts: dict | None = None,
    normalize_form: str | None = None,
    redact: bool = False,
    boilerplate_min_docs: int | None = None,
    sentence_span_min_count: int | None = None,
    span_sentences: int = 3,
    dedup: str | None = "exact",
    near_threshold: float = 0.8,
    semantic_dedup_threshold: float = 0.95,
    semantic_cluster: dict | None = None,
    dedup_against: DataFrame | None = None,
    cross_max_distance: int = 3,
    benchmark: DataFrame | None = None,
    decontam_ngram: int = 13,
    decontam_threshold: float = 0.1,
    embeddings: DataFrame | None = None,
    benchmark_embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.98,
    embedding_id_col: str = "vec_id",
    semantic_lsh: dict | None = None,
    sample_fraction: float | None = None,
    token_budget: int | None = None,
    sample_salt: str = "corpus",
    chunk_tokens: int | None = None,
    overlap: int = 0,
    pack_budget: int | None = None,
    pack_num_groups: int = 64,
) -> DataFrame:
    """Raw documents → training-ready rows; every stage optional.

    ``langid_model`` (r14): a fitted
    :class:`~wikiextractor_spark.functions.langid.LangIdModel` routes
    the ``target_lang`` gate through the TRAINED fastText-shape NB
    classifier instead of the 4-language stopword heuristic — the
    CCNet-style first gate real pipelines run.  Giving a model
    without ``target_lang`` raises (it would silently do nothing).

    Returns documents (id, text, …) when ``chunk_tokens`` is None,
    chunks ``(id, chunk_no, chunk, n_tokens)`` when set, and packed
    chunks ``(…, pack_id, over_budget)`` when ``pack_budget`` is also
    set (chunk ids are made unique per chunk before packing).
    ``pack_num_groups`` is PINNED (64) rather than letting
    :func:`~wikiextractor_spark.operators.packing.pack_sequences`
    auto-scale from a ``count()``: the count would eagerly execute
    this module's entire lazy pipeline once at composition time
    (and once per micro-batch in the streaming lift), and pack ids
    would stop being reproducible across corpus-size changes.  Raise
    it explicitly past ~2B chunks (the packer's sizing rule: ~32M
    (id, cost) rows ≈ 0.5 GB pandas per group).

    Stage order is the scale-correct one: narrow filters first (they
    push to the scan and shrink every later shuffle), dedup before
    sampling (so the sample rate applies to unique content), sampling
    on document ids (consistent across tables), chunking and packing
    last (they multiply rows).

    ``dedup_against`` subtracts near-copies (Hamming ≤
    ``cross_max_distance``) of an ALREADY-KEPT corpus after in-corpus
    dedup — the incremental-crawl flow: new data dedups against
    everything previously accepted without re-processing it.
    """
    out = df
    if url_blocklist is not None:
        # FIRST, before any text gate: the blocklist probe self-joins
        # its input (blocked-id sliver → anti join), so it must see
        # the raw column-pruned scan — placed later it would re-run
        # every interpreted text-lambda gate on both branches.  It is
        # also the cheapest gate (parse_url on short strings).
        if url_col not in out.columns:
            raise ValueError(
                f"url_blocklist given but no {url_col!r} column present"
            )
        from wikiextractor_spark.functions.urls import filter_blocked_domains

        out = filter_blocked_domains(out, url_blocklist, url_col, id_col)
    if target_lang is not None:
        if langid_model is not None:
            # the TRAINED gate (functions/langid.py, the CCNet first
            # stage): keep-ids from the RAW pruned (id, text) scan +
            # one left-semi join — NOT a score of `out`, which would
            # duplicate the upstream gate chain into the score
            # branch (the content gate's no-plan-duplication rule
            # below, measured 9 min vs seconds; r14 review)
            from wikiextractor_spark.functions.langid import (
                langid_keep_ids,
            )

            keep = langid_keep_ids(
                df.select(id_col, text_col), langid_model,
                target_lang, text_col, id_col,
            )
            out = out.join(keep, id_col, "left_semi")
        else:
            out = out.filter(lang_id(text_col) == target_lang)
    elif langid_model is not None:
        raise ValueError(
            "prepare_corpus: langid_model given without target_lang "
            "— the model only acts through the language gate"
        )
    if min_quality is not None:
        out = out.filter(quality_score(text_col) >= min_quality)
    if drop_repetitive:
        out = out.filter(~is_repetitive(text_col))
    if gopher:
        # Gopher A1.1 shape rules (word/char bands, symbol + bullet +
        # ellipsis fractions, alpha-word and stopword floors) — one
        # more narrow pushdown-able predicate; the same paper's
        # repetition rules are the drop_repetitive gate above
        from wikiextractor_spark.functions.gopher import passes_gopher_rules

        out = out.filter(passes_gopher_rules(text_col))
    if classifier_model is not None:
        # trained-model gate (functions/classifier.py QualityModel)
        # with the other narrow native filters: the weights inline as
        # literals, so this is one more pushdown-able predicate, not
        # a join — cheaper than the LM gate that follows
        from wikiextractor_spark.functions.classifier import gate_by_classifier

        out = gate_by_classifier(
            out, classifier_model, classifier_threshold, text_col
        )
    if (content_weights is None) != (min_content_logit is None):
        raise ValueError("content_weights and min_content_logit go together")
    if content_weights is not None:
        # hashed-gram content gate (functions/classifier.py
        # fit_hashed_classifier output).  The keep-id set is computed
        # from the RAW pruned (id, text) scan, not from `out`: the
        # score is per-document and runs before any text mutation, so
        # the result is identical — while a semi-join of `out`
        # against scores-of-`out` would DUPLICATE the whole upstream
        # gate chain into the score branch (each join-backed stage
        # doubling it again — measured 9 min vs seconds on a
        # six-stage stack).  Scoring a few already-gated docs is the
        # cheap side of that trade.
        from wikiextractor_spark.functions.classifier import score_hashed

        w, prior = content_weights
        scored = score_hashed(
            df.select(id_col, text_col), w, prior,
            text_col=text_col, id_col=id_col,
            **(content_hash_opts or {}),
        )
        keep = scored.filter(
            F.col("content_logit") >= min_content_logit
        ).select(id_col)
        out = out.join(keep, id_col, "left_semi")
    if (logprob_lm is None) != (min_mean_logp is None):
        raise ValueError("logprob_lm and min_mean_logp go together")
    if logprob_lm is not None:
        # LM gate: keep-ids from the RAW pruned scan for the same
        # no-plan-duplication reason as the content gate above
        # (scores are per-doc, text still unmutated here); tokenless
        # docs have no score row, so the semi-join drops them —
        # filter_by_logprob's default contract
        from wikiextractor_spark.functions.lmquality import doc_logprob_scores

        lm_keep = (
            doc_logprob_scores(
                df.select(id_col, text_col), logprob_lm, text_col, id_col
            )
            .filter(F.col("mean_logp") >= min_mean_logp)
            .select(id_col)
        )
        out = out.join(lm_keep, id_col, "left_semi")
    if dsir_target is not None and dsir_weights is not None:
        raise ValueError(
            "pass dsir_target (fit here against the raw corpus) OR "
            "dsir_weights (pre-fitted), not both"
        )
    if (dsir_target is None and dsir_weights is None) != (
        min_dsir_weight_micro is None
    ):
        raise ValueError(
            "min_dsir_weight_micro goes together with dsir_target "
            "or dsir_weights"
        )
    if min_dsir_weight_micro is None and dsir_opts is not None:
        raise ValueError(
            "dsir_opts given but unused — pass dsir_target or "
            "dsir_weights plus min_dsir_weight_micro to enable the gate"
        )
    if min_dsir_weight_micro is not None:
        # DSIR data-selection gate (operators/dsir.py): unlike the two
        # join-backed gates above, scoring is an ARRAY-LITERAL fold, so
        # the gate is one more narrow pushdown-able predicate — no
        # keep-id semi-join needed.  With ``dsir_target`` the raw
        # histogram is fit on the RAW pruned scan (`df`, not `out`):
        # importance is defined against the raw crawl distribution,
        # which also keeps the fit independent of gate order; the fit
        # is two driver-sized aggregations + one bounded collect,
        # eager at plan-build time (stated).  ``dsir_weights`` skips
        # the fit and gates through a PRE-FITTED table — or the
        # PrebuiltWeights artifact weight_map_column returns, the
        # streaming flow's mode, where a per-batch fit would drift
        # with batch composition and a per-batch collect would re-run
        # the weights lineage every micro-batch.
        # alpha only affects the FIT — in the pre-fitted modes
        # parse_gate_opts raises on it instead of silently changing
        # nothing
        _alpha, _fit = dsir.parse_gate_opts(
            dsir_opts, allow_alpha=dsir_target is not None
        )
        if dsir_weights is None:
            dsir_weights = dsir.importance_weights(
                dsir.bucket_histogram(dsir_target, text_col, **_fit),
                dsir.bucket_histogram(
                    df.select(text_col), text_col, **_fit
                ),
                _fit["buckets"],
                _alpha,
            )
        if isinstance(dsir_weights, dsir.PrebuiltWeights):
            # the pre-collected artifact carries the bucket count it
            # was validated against, so the fit/serve buckets
            # mismatch check is pure Python — no probe job, nothing
            # per micro-batch.  (Only the bucket count is checkable
            # here; a salt or n that differs from the fit remains on
            # the caller, exactly as for every other pre-fitted
            # model gate.)
            if dsir_weights.buckets != _fit["buckets"]:
                raise ValueError(
                    f"dsir_weights was built for "
                    f"{dsir_weights.buckets} buckets but dsir_opts "
                    f"says {_fit['buckets']} — buckets mismatch "
                    "between fit and serve?"
                )
            wmap = dsir_weights.col
        elif isinstance(dsir_weights, Column):
            raise TypeError(
                "raw Columns cannot be validated — pass the "
                "PrebuiltWeights from dsir.weight_map_column(...) "
                "or the weights DataFrame itself"
            )
        else:
            wmap = dsir.weight_map_column(
                dsir_weights, _fit["buckets"]
            ).col
        out = out.filter(
            dsir.score_column(wmap, text_col, **_fit)
            >= int(min_dsir_weight_micro)
        )
    if normalize_form is not None:
        # Unicode canonicalization opens the text-MUTATION block:
        # composed/decomposed twins must collapse to one byte
        # sequence BEFORE anything keys on content (redact regexes,
        # boilerplate line keys, every dedup grain).  The PLAIN
        # kernel, not normalize_if_needed's split-path: inside this
        # composed lazy pipeline the split's two filter legs would
        # DUPLICATE the whole upstream gate chain (the module-wide
        # blowup the join-backed gates avoid) — pre-normalize
        # standalone with normalize_if_needed when the corpus is
        # ASCII-majority and the crossing matters.
        from wikiextractor_spark.functions.normalize import (
            unicode_normalize,
        )

        out = out.withColumn(
            text_col, unicode_normalize(text_col, normalize_form)
        )
    if redact:
        # redact BEFORE dedup so two docs differing only in their PII
        # (same boilerplate, different email) collapse together
        out = out.withColumn(text_col, redact_pii(text_col))
    if boilerplate_min_docs is not None:
        # cross-document boilerplate lines come out AFTER the narrow
        # gates (they shrink the line-count input) and BEFORE dedup:
        # stripping shared nav/footer lines lets docs that differ only
        # in boilerplate collapse in the dedup stage
        from wikiextractor_spark.operators.spans import remove_boilerplate_lines

        out = remove_boilerplate_lines(
            out, boilerplate_min_docs, text_col, id_col
        ).drop("n_removed_lines")
        # docs that were ENTIRELY boilerplate come out empty — drop
        # them here (the C4 policy) rather than leak zero-content
        # rows into chunk/pack; the operator itself never drops rows
        out = out.filter(F.length(F.trim(F.col(text_col))) > 0)
    if sentence_span_min_count is not None:
        # the C4 keep-first three-sentence-span rule sits with the
        # other sub-document dedup (after boilerplate lines, before
        # document dedup): removing the repeated spans lets docs
        # that differ only in a shared passage collapse downstream;
        # fully-emptied docs drop like the boilerplate stage's
        from wikiextractor_spark.operators.spans import (
            dedup_sentence_spans,
        )

        out = dedup_sentence_spans(
            out, n=span_sentences, min_count=sentence_span_min_count,
            text_col=text_col, id_col=id_col,
        ).drop("n_removed_sentences")
        out = out.filter(F.length(F.trim(F.col(text_col))) > 0)
    if dedup == "exact":
        out = dedup_exact(out, text_col, id_col)
    elif dedup == "near":
        out = dedup_near(out, text_col, id_col, threshold=near_threshold)
    elif dedup == "semantic":
        # SemDeDup grain: paraphrase-level duplicates by embedding
        # cosine, clustered by the IVF quantizer so pairing stays
        # within clusters.  Docs WITHOUT an embedding row pass
        # through (stated — the losers anti-join only removes ids
        # the pair stage actually condemned; a semi-join on
        # survivors would silently drop unmapped docs).
        if embeddings is None:
            raise ValueError("dedup='semantic' requires embeddings")
        from wikiextractor_spark.operators.similarity import semantic_dedup

        # materialize the kept-embeddings sliver: semantic_dedup
        # references its input ~5 times (self-join sides, survivor
        # and loser anti-joins) plus the iterative centroid fit — an
        # unmaterialized plan would embed the whole upstream gate
        # chain into every reference, the exact compounding blowup
        # the join-backed gates above avoid.  This makes
        # dedup='semantic' an EAGER stage (stated in the module doc).
        emb_kept = embeddings.join(
            out.select(F.col(id_col).alias(embedding_id_col)),
            embedding_id_col, "left_semi",
        ).localCheckpoint(eager=True)
        survivors = semantic_dedup(
            emb_kept, semantic_dedup_threshold, id_col=embedding_id_col,
            **(semantic_cluster or {}),
        )
        losers = emb_kept.join(
            survivors.select(embedding_id_col), embedding_id_col, "left_anti"
        ).select(F.col(embedding_id_col).alias(id_col))
        out = out.join(losers, id_col, "left_anti")
    elif dedup is not None:
        raise ValueError(
            "dedup must be 'exact', 'near', 'semantic', or None, "
            f"got {dedup!r}"
        )
    if dedup_against is not None:
        # cross-corpus subtraction AFTER in-corpus dedup: drop every
        # doc with a Hamming <= cross_max_distance near-copy in the
        # already-kept corpus (incremental crawl hygiene) without
        # re-deduplicating the kept side
        from wikiextractor_spark.operators.dedup import subtract_near_duplicates

        out = subtract_near_duplicates(
            out, dedup_against, text_col, id_col,
            max_distance=cross_max_distance,
        )
    if benchmark is not None:
        # after dedup (fewer docs to gram-hash), before sampling (the
        # sample rate should apply to the clean population)
        out = decontaminate(
            out, benchmark, text_col=text_col, id_col=id_col,
            n=decontam_ngram, threshold=decontam_threshold,
        )
    if benchmark_embeddings is not None and embeddings is None:
        raise ValueError("benchmark_embeddings requires embeddings")
    if (
        embeddings is not None
        and benchmark_embeddings is None
        and dedup != "semantic"
    ):
        raise ValueError(
            "embeddings given but unused: pass benchmark_embeddings "
            "(semantic decontamination) and/or dedup='semantic'"
        )
    if embeddings is not None and benchmark_embeddings is not None:
        # SEMANTIC decontamination next to the n-gram one: drop docs
        # whose embedding sits at cosine >= semantic_threshold of a
        # benchmark item — paraphrased leakage that token overlap
        # misses.  `embeddings` maps this corpus's ids
        # (embedding_id_col ↔ id_col values) to vectors.
        # ``semantic_lsh`` forwards the LSH shape (dim= above all:
        # the default is 64 and the sketch raise_errors on any other
        # vector length rather than degenerate); like token_budget,
        # this stage is an EAGER exception to the one-lazy-plan rule
        # (the sketch materializes so the band join doesn't recompute
        # it per side).
        from wikiextractor_spark.operators.similarity import (
            flagged_embedding_ids,
        )

        flagged = flagged_embedding_ids(
            embeddings, benchmark_embeddings, semantic_threshold,
            id_col=embedding_id_col, **(semantic_lsh or {}),
        ).withColumnRenamed(embedding_id_col, id_col)
        out = out.join(flagged, id_col, "left_anti")
    if sample_fraction is not None and token_budget is not None:
        raise ValueError("give sample_fraction OR token_budget, not both")
    if sample_fraction is not None:
        out = deterministic_sample(out, id_col, sample_fraction, sample_salt)
    elif token_budget is not None:
        # NB: unlike every other stage this one runs an eager
        # measuring aggregate over the upstream plan (budget/total
        # needs the total), so it breaks the one-lazy-plan property —
        # acceptable because the measurement is one cheap agg and the
        # gate itself stays narrow
        out = sample_token_budget(
            out, token_budget, id_col=id_col, text_col=text_col,
            salt=sample_salt,
        )
    if chunk_tokens is None:
        if pack_budget is not None:
            raise ValueError("pack_budget requires chunk_tokens")
        return out
    chunks = chunk_documents(out, text_col, id_col, chunk_tokens, overlap)
    if pack_budget is None:
        return chunks
    # one id per CHUNK so packing's unit is the training row; the
    # shift keeps (doc_id, chunk_no) recoverable from the packed id.
    # Range contract: doc_id ∈ [0, 2^43) and chunk_no < 2^20, else the
    # packed id collides silently — enforced per row INSIDE the
    # projection (raise_error is JVM-side and adds no extra pass over
    # the corpus, unlike a driver-side max-agg)
    guard = (
        f"CASE WHEN {id_col} < 0 OR {id_col} >= {1 << 43} "
        f"OR chunk_no >= {1 << 20} THEN "
        f"raise_error(concat('chunk_id packing needs 0 <= {id_col} < 2^43 "
        f"and chunk_no < 2^20; got {id_col}=', {id_col}, "
        f"', chunk_no=', chunk_no)) "
        f"ELSE cast({id_col} as long) * {1 << 20} + chunk_no END"
    )
    chunks = chunks.withColumn("chunk_id", F.expr(guard))
    assignment = pack_sequences(
        chunks, token_col="n_tokens", id_col="chunk_id",
        budget=pack_budget, num_groups=pack_num_groups,
    ).select("chunk_id", "pack_id", "over_budget")
    # one co-partitioned equi-join to carry the text alongside the
    # assignment (the packer ships only (id, tokens) through Python)
    return chunks.join(assignment, "chunk_id")


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus profile — the health report an operator reads
    before and after :func:`prepare_corpus`:

    ``(n_docs, n_tokens, avg_tokens, tokens_p50, tokens_p95,
    tokens_p99, avg_quality, frac_repetitive, frac_pii, frac_empty)``

    NULL text is treated as empty text throughout, so every rate
    shares the ``n_docs`` denominator; empty/NULL docs contribute
    ZERO tokens (``split('')`` would otherwise report a phantom
    token), are excluded from the quality average (its ratio terms
    ANSI-error on ''), and surface in ``frac_empty``.

    100 TB shape: ONE narrow aggregate over the corpus.  Every signal
    is a native per-row expression (token counts, the quality score,
    the repetition gate, the PII detector) feeding map-side-combined
    aggregates; the quantiles use ``percentile_approx`` — an
    executor-side sketch merged on the driver, never a sort.  Nothing
    here shuffles more than one row per task.

    Language distribution is deliberately NOT in this row — it is a
    distinct-value aggregation with its own shape; see
    :func:`lang_breakdown`.
    """
    from wikiextractor_spark.functions.pii import has_pii
    from wikiextractor_spark.functions.textstats import token_count

    # one denominator for every rate: NULL ≡ '' before any signal
    src = df.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
    nonempty = F.length(F.trim(F.col(text_col))) > 0
    toks = F.when(nonempty, token_count(F.col(text_col))).otherwise(F.lit(0))
    return src.agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
        F.round(F.avg(toks), 2).alias("avg_tokens"),
        F.percentile_approx(toks, 0.5).alias("tokens_p50"),
        F.percentile_approx(toks, 0.95).alias("tokens_p95"),
        F.percentile_approx(toks, 0.99).alias("tokens_p99"),
        F.round(
            F.avg(F.when(nonempty, quality_score(text_col))), 4
        ).alias("avg_quality"),
        F.round(
            F.avg(is_repetitive(text_col).cast("double")), 4
        ).alias("frac_repetitive"),
        F.round(F.avg(has_pii(text_col).cast("double")), 4).alias("frac_pii"),
        F.round(F.avg((~nonempty).cast("double")), 4).alias("frac_empty"),
    )


def lang_breakdown(
    df: DataFrame, k: int = 20, text_col: str = "text",
) -> DataFrame:
    """→ ``(lang, n)``: the corpus's top-``k`` predicted languages
    with exact counts.  The lang-ID label space is a handful of
    values, so this is ONE native groupBy with map-side combine
    (≤ |labels| rows per task cross the shuffle) — the heavy-hitter
    sketch machinery would route the corpus through Arrow twice for a
    grain that needs neither a cap nor a recount."""
    return (
        df.select(lang_id(text_col).alias("lang"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "lang")
        .limit(k)
    )
