"""Streaming crawl-archive ingestion: raw WET/WARC files → the
engine's documents-parquet surface, continuously.

A crawler never delivers one finished snapshot — archives land every
few minutes for months.  This flow turns them into the documents
surface as they arrive, so the downstream streaming stages
(:func:`~wikiextractor_spark.streaming.corpus.prepare_corpus_stream`,
:func:`~wikiextractor_spark.streaming.annindex.index_embeddings_stream`)
consume a continuously-growing corpus instead of waiting for a batch
re-run.

**Manifest-driven by design.**  Spark's streaming file source does
not support the ``binaryFile`` format the strict readers are built
on, and streaming the archive BYTES through a text source would read
every file twice.  Instead the stream watches a MANIFEST directory:
the crawler publishes one line per COMPLETED archive (its path),
written atomically (write-temp-then-rename — the standard file-sink
publication contract).  This is also the production-correct
completion signal: a pure directory watch can observe a half-written
archive; a manifest line exists only after the archive is whole.

Per micro-batch: the new manifest lines (driver-sized by
construction — file PATHS, bounded by ``maxFilesPerTrigger`` × lines
per manifest; even 10⁵ paths is megabytes) go to the batch reader
(:func:`~wikiextractor_spark.sources.wet.wet_documents` /
:func:`~wikiextractor_spark.sources.wet.warc_html_documents` — the
SAME kernels as batch ingest, no parallel implementation to drift),
and the resulting documents land under ``batch_id=<epoch>`` with
per-partition overwrite — an at-least-once replay rewrites its own
partition, so delivery is exact-once without a ledger (the signature
store's trick; the hive layout permits it here, unlike the
centroid-partitioned ANN index).  ``doc_id`` is content-hashed by
the readers, so any residual overlap is exactly the downstream
cross-batch dedup grain.

A manifest line naming a missing archive fails the stream fast
(the batch reader raises) rather than skipping silently — a crawler
that publishes manifests before archives finish violates the
contract above and must be surfaced, not papered over.

Composition: read the output as a stream with an explicit schema
over the emitted columns (``doc_id long, url string, text string,
source string, n_chars long`` plus ``title``/``declared_lang`` when
``with_meta``), pointing INTO the partitions
(``{out_dir}/batch_id=*``) so the partition key does not join the
schema — the exact input shape ``prepare_corpus_stream`` takes via
its ``schema=`` parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def crawl_documents_stream(
    spark: SparkSession, manifest_dir: str, out_dir: str,
    checkpoint_dir: str, *,
    source: str = "warc",
    strict: bool = True,
    main_content: bool = False,
    with_meta: bool = False,
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
    trigger_available_now: bool = True,
):
    """Continuously ingest crawl archives named by manifest lines
    under ``manifest_dir`` into a ``batch_id=``-partitioned documents
    store at ``out_dir``.  ``source='wet'`` parses WET ``conversion``
    records; ``source='warc'`` parses raw ``response`` records with
    the native HTML strip (``main_content``/``with_meta`` exactly as
    in :func:`~wikiextractor_spark.sources.wet.warc_html_documents`).
    Returns the StreamingQuery.  See the module docstring for the
    manifest and delivery contracts."""
    if source not in ("warc", "wet"):
        raise ValueError(
            f"crawl_documents_stream: source must be 'warc' or 'wet', "
            f"got {source!r}"
        )
    from wikiextractor_spark.sources.wet import (
        warc_html_documents,
        wet_documents,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        paths = [
            line
            for r in batch_df.select("value").collect()
            if (line := r["value"].strip())
        ]
        if not paths:
            # nothing published this epoch; an empty replay is
            # naturally a no-op (no partition to rewrite)
            return
        if source == "wet":
            docs = wet_documents(spark, paths, strict=strict)
        else:
            docs = warc_html_documents(
                spark, paths, strict=strict,
                main_content=main_content, with_meta=with_meta,
            )
        (
            docs.withColumn("source", F.lit(source))
            .withColumn("n_chars", F.length("text").cast("long"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    writer = (
        reader.text(manifest_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
