"""Streaming deduplication (§2.10 extension surface).

Two training-pipeline ingestion patterns the batch dedup operators
(``operators/dedup.py``) cannot express, because arrival is unbounded:

* **Exactly-once event ingestion** — upstream delivery is at-least-
  once (retries, replayed files), so the same ``event_id`` can arrive
  more than once.  ``dropDuplicatesWithinWatermark`` keeps the first
  occurrence and holds per-key state ONLY until the watermark passes
  the key's event time + delay, so state is bounded by the duplicate
  window, not by the stream's lifetime — the property that makes this
  runnable forever on a real cluster.
* **Content-hash document dedup** — the streaming twin of
  ``dedup.exact_duplicate_groups``: hash the text once (narrow), drop
  repeats of the hash.  Documents carry no event time, so the
  unbottled variant holds one state row per distinct hash for the
  stream's lifetime; the docstring (and the ``ingest_ts`` variant's
  existence) makes that trade explicit rather than implicit.

Both reuse the batch schemas/normalizations from ``stream.py`` so a
batch backfill and the live stream produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from wikiextractor_spark.streaming.stream import DOCUMENTS_SCHEMA, EVENTS_SCHEMA


def deduped_event_stream(
    spark: SparkSession, input_dir: str, watermark: str = "2 hours",
    path_glob: str | None = None,
) -> DataFrame:
    """Events stream with at-least-once delivery collapsed to
    exactly-once on ``event_id``.

    State bound: one row per event_id seen within the trailing
    ``watermark`` of event time; the state store evicts keys as the
    watermark advances, so memory is O(duplicate window), independent
    of total stream length.  Duplicates that arrive more than
    ``watermark`` apart are NOT collapsed — that is the contract knob,
    sized to the upstream redelivery horizon.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return (
        reader.parquet(input_dir)
        # same nanos→timestamp normalization as the batch reader
        # (sources/tables.py): the driver's parquet stores
        # TIMESTAMP(NANOS), read raw and converted here
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def dedup_events_to_parquet(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str,
    watermark: str = "2 hours", path_glob: str | None = None,
):
    """Drain :func:`deduped_event_stream` to an append-mode parquet
    file sink (executors write; no driver-side state), availableNow
    for batch-parity runs — drop the trigger for a live tail."""
    stream = deduped_event_stream(spark, input_dir, watermark, path_glob)
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def deduped_document_stream(
    spark: SparkSession, input_dir: str, path_glob: str | None = None,
) -> DataFrame:
    """Documents stream with exact content dedup: first arrival of each
    ``sha2(text)`` wins, repeats are dropped.

    The hash is computed per row (narrow, JVM-side); the only stateful
    op is the drop itself.  Documents have no event-time column, so
    this uses plain ``dropDuplicates`` — state grows with the number
    of DISTINCT hashes and never expires.  That is the correct
    semantics for "never re-emit a document we have ever emitted", and
    the honest cost of it; when the upstream attaches an ingest
    timestamp, put a watermark on it and switch to
    ``dropDuplicatesWithinWatermark`` (exactly the
    :func:`deduped_event_stream` topology) to bound state by the
    redelivery horizon instead.
    """
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return (
        reader.parquet(input_dir)
        .withColumn("content_hash", F.sha2(F.col("text"), 256))
        .dropDuplicates(["content_hash"])
    )
