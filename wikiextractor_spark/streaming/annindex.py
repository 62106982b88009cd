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

Delivery contract, stated precisely:

* **Replays of completed batches are exact-once**: every applied
  batch id is recorded in a tiny ``<index_dir>/ingest_log`` ledger
  and re-deliveries skip before any write (the standard
  ``foreachBatch`` idempotency pattern; single writer per index,
  like the signature store).
* **A crash BETWEEN the index append and the ledger commit can
  duplicate that one batch** on restart — the two writes are not
  atomic (the index layout is hive-partitioned by centroid, which
  rules out the sibling signature store's per-``batch_id=``
  overwrite trick).  Detect via :func:`ivf_index_stats` against the
  source count after an unclean stop; recover by rebuilding or by
  deduplicating search results on ``neighbor_id``.
* **The ledger is coupled to ONE checkpoint lineage**: Spark numbers
  micro-batches per checkpoint, so recreating the checkpoint dir
  without rebuilding the index would renumber batches from 0 and
  the stale ledger would silently skip them.  ``build_ivf_index``
  therefore deletes ``ingest_log`` on every rebuild; if you must
  re-checkpoint WITHOUT rebuilding, clear ``ingest_log`` yourself.

The applied-id set is cached in the writer's closure (single-writer
contract) so steady state does one ledger READ at stream start, not
one per batch; each applied batch appends one tiny ledger file —
compact with :func:`compact_ingest_log` on long-running streams.
The DATA files fragment the same way (one file per touched centroid
partition per batch, one per batch in ``assignments``) — fold them
back to the build layout with :func:`~wikiextractor_spark.operators.
similarity.compact_ivf_index` while the stream is stopped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from wikiextractor_spark.functions.modelio import write_one_file

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
    _applied: set[int] | None = None, _artifacts: tuple | None = None,
) -> bool:
    """Append one batch to the index at most once per ledger lineage:
    returns False (no write) when ``batch_id`` is already in the
    ingest ledger.  Empty batches are ledgered too, so a replayed
    empty epoch stays a no-op.  ``_applied``/``_artifacts`` are the
    stream writer's caches (applied-id set, kept in sync here, and
    the frozen ``(centroids, books, sq)`` triple so per-batch appends
    make ZERO artifact reads — absent artifacts pass as the
    probe-free ``VERIFIED_ABSENT`` marker, valid under the frozen-
    index contract because the stream loaded them once at start; a
    legacy 2-tuple still works but re-reads the SQ codec per batch);
    omit both for one-off calls.  See the module docstring for the
    exact delivery contract."""
    from wikiextractor_spark.operators.similarity import (
        VERIFIED_ABSENT,
        ivf_index_add,
    )

    applied = (
        _applied if _applied is not None
        else _applied_batches(spark, index_dir)
    )
    if batch_id in applied:
        return False
    kwargs = {}
    if _artifacts is not None:
        kwargs = {
            "centroids": _artifacts[0],
            "books": (
                _artifacts[1] if _artifacts[1] is not None
                else VERIFIED_ABSENT
            ),
        }
        if len(_artifacts) > 2:
            kwargs["sq"] = (
                _artifacts[2] if _artifacts[2] is not None
                else VERIFIED_ABSENT
            )
    # no emptiness pre-check here: ivf_index_add materializes the
    # batch once (its assignment checkpoint) and no-ops the writes
    # itself when empty — a separate take(1) would be one extra
    # Spark job per micro-batch on the hot streaming path
    ivf_index_add(
        spark, index_dir,
        batch_df.select(F.col(id_col), F.col(vec_col)),
        id_col, vec_col, **kwargs,
    )
    from wikiextractor_spark.localframe import local_rows_df

    write_one_file(
        local_rows_df(spark, [(int(batch_id),)], "batch_id long"),
        f"{index_dir}/ingest_log",
        mode="append",
    )
    applied.add(int(batch_id))
    return True


def compact_ingest_log(spark: SparkSession, index_dir: str) -> int:
    """Rewrite the one-file-per-batch ledger as a single file (run
    between stream runs — the ledger is integers, always tiny) and
    return the number of applied batches.  Same maintenance role as
    the signature store's compaction."""
    applied = sorted(_applied_batches(spark, index_dir))
    from wikiextractor_spark.localframe import local_rows_df

    write_one_file(
        local_rows_df(spark, [(b,) for b in applied], "batch_id long"),
        f"{index_dir}/ingest_log",
    )
    return len(applied)


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
    from wikiextractor_spark.operators.similarity import (
        load_ivf_centroids,
        load_pq_books,
        load_sq_codec,
    )

    # fail fast on a missing index, and load the FROZEN artifacts
    # exactly once for the run — the stream's contract declares them
    # immutable for its lifetime, so re-reading centroids/codebooks
    # per micro-batch would be pure overhead.  The three artifact
    # loads and the one-per-run ledger read (single-writer contract;
    # add_embeddings_batch keeps the set current per applied batch)
    # are four independent read-only collects over the frozen index —
    # overlapped on threads (r16, guide §2.6), consumed in the
    # original order so exception precedence is unchanged
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as _pool:
        f_cent = _pool.submit(load_ivf_centroids, spark, index_dir)
        f_books = _pool.submit(load_pq_books, spark, index_dir)
        f_sq = _pool.submit(load_sq_codec, spark, index_dir)
        f_applied = _pool.submit(_applied_batches, spark, index_dir)
        artifacts = (f_cent.result(), f_books.result(), f_sq.result())
        applied = f_applied.result()

    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(input_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        add_embeddings_batch(
            spark, index_dir, batch_df, batch_id, id_col, vec_col,
            _applied=applied, _artifacts=artifacts,
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
