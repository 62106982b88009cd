"""Streaming IVF-index maintenance: new embedding batches append to
a PERSISTED index as they land.

A retrieval/dedup corpus grows continuously (nightly crawl
snapshots, per-hour embedding jobs); rebuilding the ANN index per
snapshot re-pays the full train + assign + write.  This flow runs
:func:`~wikiextractor_spark.operators.similarity.ivf_index_add` per
micro-batch against a PRE-BUILT index — the same frozen-artifact
contract the corpus stream uses for its classifiers (training per
micro-batch would drift with batch composition; quantizer retrain is
an offline decision driven by :func:`ivf_index_stats`).

Replay idempotence, stated: ``ivf_index_add`` is an APPEND — an
at-least-once redelivery would double-insert every vector of the
replayed batch.  Each applied batch id is therefore recorded in a
tiny ``<index_dir>/ingest_log`` ledger and re-deliveries are skipped
before any write — the standard ``foreachBatch`` idempotency
pattern (single-writer per index, like the signature store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EMBEDDINGS_SCHEMA = "vec_id long, embedding array<double>"


def _applied_batches(spark: SparkSession, index_dir: str) -> set[int]:
    from wikiextractor_spark.fsutil import hadoop_fs

    jpath, fs = hadoop_fs(spark, f"{index_dir}/ingest_log")
    if not fs.exists(jpath):
        return set()
    return {
        int(r["batch_id"])
        for r in spark.read.parquet(f"{index_dir}/ingest_log").collect()
    }


def add_embeddings_batch(
    spark: SparkSession, index_dir: str, batch_df: DataFrame,
    batch_id: int, id_col: str = "vec_id", vec_col: str = "embedding",
) -> bool:
    """Append one batch to the index EXACTLY ONCE: returns False (no
    write) when ``batch_id`` is already in the ingest ledger —
    re-running the same batch, as an at-least-once source replay
    does, must not double-insert its vectors.  Empty batches are
    ledgered too, so a replayed empty epoch stays a no-op."""
    from wikiextractor_spark.operators.similarity import ivf_index_add

    if batch_id in _applied_batches(spark, index_dir):
        return False
    if batch_df.take(1):
        ivf_index_add(
            spark, index_dir,
            batch_df.select(F.col(id_col), F.col(vec_col)),
            id_col, vec_col,
        )
    (
        spark.createDataFrame([(int(batch_id),)], "batch_id long")
        .coalesce(1)
        .write.mode("append")
        .parquet(f"{index_dir}/ingest_log")
    )
    return True


def index_embeddings_stream(
    spark: SparkSession, input_dir: str, index_dir: str,
    checkpoint_dir: str, schema: str = EMBEDDINGS_SCHEMA,
    path_glob: str | None = None, trigger_available_now: bool = True,
    id_col: str = "vec_id", vec_col: str = "embedding",
):
    """Continuously ingest embedding files from ``input_dir`` into
    the persisted IVF index at ``index_dir`` (which MUST already
    exist — build it once with
    :func:`~wikiextractor_spark.operators.similarity.build_ivf_index`;
    a PQ-carrying index gets its appends encoded against the stored
    codebooks automatically).  Returns the StreamingQuery."""
    from wikiextractor_spark.operators.similarity import load_ivf_centroids

    # fail fast on a missing index — otherwise the first micro-batch
    # dies inside foreachBatch with a buried read error
    load_ivf_centroids(spark, index_dir)

    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(input_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        add_embeddings_batch(
            spark, index_dir, batch_df, batch_id, id_col, vec_col
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
