"""Streaming corpus preparation: the :func:`~wikiextractor_spark.
operators.corpus.prepare_corpus` composition lifted onto an unbounded
document stream.

A training-data pipeline rarely gets its corpus as one finished
snapshot — crawls land continuously.  This flow runs the same staged
composition per micro-batch via ``foreachBatch``:

    raw documents (stream)
      → narrow filters / redaction      (stateless: identical per batch)
      → cross-batch near dedup          (bucketed signature store —
                                         the ONE stage that needs
                                         cross-batch state)
      → decontaminate                   (static benchmark, broadcast
                                         per batch)
      → deterministic sample            (hash gate: stateless AND
                                         replay-idempotent — the same
                                         doc id gates identically in
                                         any batch)
      → chunk → pack                    (packs are per micro-batch;
                                         FFD needs a bounded working
                                         set, and a training shard is
                                         naturally batch-grained)

Stage trades stated explicitly:

* ``token_budget`` sampling is NOT offered — it needs the corpus-wide
  token total, which an unbounded stream never has.  Use
  ``sample_fraction`` (stateless) and budget offline.
* ``url_blocklist`` needs a URL column: the default streaming schema
  (``DOCUMENTS_SCHEMA``) carries none, so pass
  ``schema=DOCUMENTS_URL_SCHEMA`` (or your own schema with the
  ``url_col`` column) alongside the blocklist — real crawl streams
  carry URLs.  The blocklist is a static broadcast, so the gate is
  stateless and runs FIRST per micro-batch, exactly like the batch
  composition (parity-pinned); a blocklist without a matching schema
  column fails fast at stream definition, not per batch.
* ``boilerplate_min_docs`` (cross-document line removal) is NOT
  offered either — "appears in ≥ N distinct documents" is a
  corpus-wide count: a per-batch count would miss boilerplate spread
  thinly across batches, and a cross-batch line-count store would
  need retroactive rewrites of already-emitted batches the moment a
  line crosses the threshold.  Run
  :func:`~wikiextractor_spark.operators.spans.remove_boilerplate_lines`
  as a batch pass over the accumulated output instead.
* Packs never span micro-batches: ``pack_id`` is unique only within a
  batch's output partition (read with the ``batch_id`` column).
* Output and signature-store writes land under ``batch_id=<epoch>``
  with per-partition overwrite, so an at-least-once replay rewrites
  its own partition; the store read excludes the replaying batch's own
  generation (see ``dedup.read_store_buckets``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from wikiextractor_spark.streaming.dedup import dedup_batch_against_store
from wikiextractor_spark.streaming.stream import DOCUMENTS_SCHEMA

# DOCUMENTS_SCHEMA + the url column a crawl stream carries — the
# schema to pass when wiring ``url_blocklist`` (the default schema
# has no url, and the gate refuses to run without one)
DOCUMENTS_URL_SCHEMA = StructType(
    DOCUMENTS_SCHEMA.fields + [StructField("url", StringType())]
)


def prepare_corpus_stream(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str,
    state_dir: str, path_glob: str | None = None,
    trigger_available_now: bool = True, schema=DOCUMENTS_SCHEMA,
    *,
    url_blocklist=None,
    url_col: str = "url",
    target_lang: str | None = None,
    min_quality: float | None = None,
    drop_repetitive: bool = False,
    gopher: bool = False,
    classifier_model=None,
    classifier_threshold: float = 0.0,
    content_weights=None,
    min_content_logit: float | None = None,
    content_hash_opts: dict | None = None,
    logprob_lm: DataFrame | None = None,
    min_mean_logp: float | None = None,
    dsir_weights: DataFrame | None = None,
    min_dsir_weight_micro: int | None = None,
    dsir_opts: dict | None = None,
    normalize_form: str | None = None,
    redact: bool = False,
    dedup: str | None = "near",
    max_distance: int = 3,
    benchmark: DataFrame | None = None,
    decontam_ngram: int = 13,
    decontam_threshold: float = 0.1,
    sample_fraction: float | None = None,
    sample_salt: str = "corpus",
    chunk_tokens: int | None = None,
    overlap: int = 0,
    pack_budget: int | None = None,
    stats_dir: str | None = None,
):
    """Continuous corpus preparation over a document-directory stream.

    ``dedup='near'`` is the cross-batch Hamming ≤ ``max_distance``
    suppression backed by the bucketed signature store; ``None`` skips
    dedup (for exact-hash streaming dedup use
    :func:`~wikiextractor_spark.streaming.deduped_document_stream`,
    whose state lives in the streaming state store).  All other knobs
    mirror :func:`~wikiextractor_spark.operators.corpus.prepare_corpus`
    and are applied with the same stage order per micro-batch.
    Returns the StreamingQuery.

    ``stats_dir`` turns on per-batch observability: each micro-batch
    appends TWO :func:`~wikiextractor_spark.operators.corpus.corpus_stats`
    rows — ``stage='in'`` over the raw batch, ``stage='out'`` over
    the kept DOCUMENTS after every document-grain stage (gates,
    dedup, decontamination, sampling; before the row-multiplying
    chunk/pack) — keyed by ``batch_id``.  The
    in-vs-out delta per batch is the drop-rate alerting signal a
    production ingest watches (a batch whose out/in ratio collapses
    means upstream drift, a dedup store anomaly, or a bad gate
    threshold).  Costs one extra narrow aggregate pass per stage per
    batch; idempotent under replay (stats land under their own
    ``batch_id=<epoch>`` partition with overwrite, exactly like the
    data partitions).
    """
    from wikiextractor_spark.operators.corpus import prepare_corpus

    if dedup not in ("near", None):
        raise ValueError(
            f"streaming dedup must be 'near' or None, got {dedup!r}; "
            "exact-hash streaming dedup is deduped_document_stream"
        )
    # readStream.schema() accepts a DDL string as well as a
    # StructType (the sibling annindex stream's default is a DDL
    # string) — normalize before probing field names
    field_names = (
        schema.fieldNames() if hasattr(schema, "fieldNames")
        else StructType.fromDDL(schema).fieldNames()
    )
    if url_blocklist is not None and url_col not in field_names:
        # fail at stream DEFINITION, not inside every micro-batch:
        # the batch composition's per-call raise would otherwise fire
        # only once the first batch lands
        raise ValueError(
            f"url_blocklist given but the stream schema has no "
            f"{url_col!r} column — pass schema=DOCUMENTS_URL_SCHEMA "
            "(or a schema carrying the url column)"
        )
    if normalize_form is not None:
        # fail at stream DEFINITION, not inside the first micro-batch
        # (where an invalid form surfaces as an opaque
        # StreamingQueryException) — the url_blocklist principle
        from wikiextractor_spark.functions.normalize import _check_form

        _check_form(normalize_form, "prepare_corpus_stream")
    if (dsir_weights is None) != (min_dsir_weight_micro is None):
        # same fail-at-definition principle for the DSIR contract
        raise ValueError(
            "dsir_weights and min_dsir_weight_micro go together"
        )
    if dsir_weights is None and dsir_opts is not None:
        raise ValueError(
            "dsir_opts given but unused — pass dsir_weights plus "
            "min_dsir_weight_micro to enable the gate"
        )
    dsir_wmap = None
    if dsir_weights is not None:
        from wikiextractor_spark.operators import dsir as _dsir

        # typo'd keys — and alpha, which only affects the fit this
        # flow never runs — fail HERE, at stream definition
        _, _fit = _dsir.parse_gate_opts(dsir_opts, allow_alpha=False)
        # collect the weight table and build the literal array ONCE
        # at stream definition: weight_map_column inside the batch fn
        # would re-run the weights lineage + a driver collect on
        # EVERY micro-batch
        dsir_wmap = _dsir.weight_map_column(dsir_weights, _fit["buckets"])

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # narrow stages: filters + redaction (stage order identical to
        # the batch composition — prepare_corpus with the stateful and
        # row-multiplying stages switched off; the URL gate is a
        # static broadcast, stateless per batch, and runs FIRST like
        # the batch stage order mandates)
        filtered = prepare_corpus(
            batch_df,
            url_blocklist=url_blocklist,
            url_col=url_col,
            target_lang=target_lang,
            min_quality=min_quality,
            drop_repetitive=drop_repetitive,
            gopher=gopher,
            # PRE-FITTED models only (fit on the kept corpus or a
            # trusted reference): fitting per micro-batch would make
            # the gates drift with batch composition
            classifier_model=classifier_model,
            classifier_threshold=classifier_threshold,
            content_weights=content_weights,
            min_content_logit=min_content_logit,
            content_hash_opts=content_hash_opts,
            logprob_lm=logprob_lm,
            min_mean_logp=min_mean_logp,
            # PRE-FITTED weights only, like the other model gates: a
            # per-batch DSIR fit would make the importance gate drift
            # with batch composition (prepare_corpus's dsir_target
            # mode is deliberately not exposed here).  The map was
            # collected once at stream definition.
            dsir_weights=dsir_wmap,
            min_dsir_weight_micro=min_dsir_weight_micro,
            dsir_opts=dsir_opts,
            # per-row and batch-composition-independent, so safe per
            # micro-batch (unlike sentence-span dedup, whose
            # keep-first winner is a CORPUS-global property —
            # deliberately not exposed here)
            normalize_form=normalize_form,
            redact=redact,
            dedup=None,
        ).localCheckpoint(eager=True)
        if dedup == "near":
            survivors = dedup_batch_against_store(
                spark, filtered, state_dir, batch_id,
                max_distance=max_distance,
            )
        else:
            survivors = filtered
        # downstream document-grain stages: decontaminate + sample —
        # the last point where a row still IS a document
        kept = prepare_corpus(
            survivors,
            dedup=None,
            benchmark=benchmark,
            decontam_ngram=decontam_ngram,
            decontam_threshold=decontam_threshold,
            sample_fraction=sample_fraction,
            sample_salt=sample_salt,
        )
        if stats_dir is not None:
            # the stats agg and the output write both consume `kept`;
            # materialize once so decontamination doesn't run twice
            kept = kept.localCheckpoint(eager=True)
        # row-multiplying stages last: chunk + pack
        out = prepare_corpus(
            kept,
            dedup=None,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            pack_budget=pack_budget,
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        if stats_dir is not None:
            from wikiextractor_spark.functions.modelio import write_one_file
            from wikiextractor_spark.operators.corpus import corpus_stats

            stats = corpus_stats(batch_df).withColumn(
                "stage", F.lit("in")
            ).unionByName(
                corpus_stats(kept).withColumn("stage", F.lit("out"))
            )
            # aggregated two-row frame — not the pickled-slice trap,
            # but every artifact-style single-file write routes
            # through the documented repartition(1) helper so the
            # coalesce(1) rule stays greppable
            write_one_file(stats, f"{stats_dir}/batch_id={batch_id}")

    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    writer = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
