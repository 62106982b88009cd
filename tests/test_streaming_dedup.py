"""Streaming dedup: exactly-once event ingestion and content-hash
document dedup (wikiextractor_spark/streaming/dedup.py).

The fixture duplicates the real sf0.001 parquet files byte-for-byte
(an at-least-once redelivery, exactly as a replayed upstream file
lands), so the streams see every row at least twice."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.streaming import (
    dedup_events_to_parquet,
    deduped_document_stream,
)


def _drain(q, timeout=120):
    assert q.awaitTermination(timeout), "streaming query did not drain"


@pytest.fixture()
def dup_events_dir(tmp_path, sf_dir):
    src = tmp_path / "events_dup"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    return src


def test_event_dedup_single_run(spark, tmp_path, dup_events_dir, sf_dir):
    """Both copies land in one backlog: every event_id is emitted
    exactly once, and the survivor set equals the batch distinct."""
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = dedup_events_to_parquet(
        spark, str(dup_events_dir), str(out), str(ckpt)
    )
    _drain(q)

    got = spark.read.parquet(str(out))
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id").distinct().count()
    )
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_event_dedup_survives_restart(spark, tmp_path, sf_dir):
    """The duplicate file arrives AFTER the first drain: the second
    run's dedup state (restored from the checkpoint) plus the
    watermark late-filter drop every replayed row — zero new emits."""
    src = tmp_path / "events_replay"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    q = dedup_events_to_parquet(spark, str(src), str(out), str(ckpt))
    _drain(q)
    n_first = spark.read.parquet(str(out)).count()

    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    q = dedup_events_to_parquet(spark, str(src), str(out), str(ckpt))
    _drain(q)

    got = spark.read.parquet(str(out))
    assert got.count() == n_first
    assert got.select("event_id").distinct().count() == n_first


def test_document_content_dedup(spark, tmp_path, sf_dir):
    """First arrival of each sha2(text) wins: the survivor count is
    the number of DISTINCT texts (the source itself plants exact
    duplicates, so this is below the row count even for one copy)."""
    src = tmp_path / "docs_dup"
    src.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/documents.parquet", src / "b.parquet")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    q = (
        deduped_document_stream(spark, str(src))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)

    got = spark.read.parquet(str(out))
    n_texts = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text").distinct().count()
    )
    assert got.count() == n_texts
    assert got.select("content_hash").distinct().count() == n_texts
    # the batch twin agrees: same survivor hash set as groupBy-min
    batch_hashes = {
        r["content_hash"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.sha2("text", 256).alias("content_hash"))
        .distinct()
        .collect()
    }
    assert {r["content_hash"] for r in got.select("content_hash").collect()} == batch_hashes


def test_document_signature_near_dedup(spark, tmp_path, sf_dir):
    """Signature-grain streaming near-dedup: exact copies share a
    64-bit SimHash, so the duplicated backlog collapses to at most the
    distinct-signature count — and the signature set equals the batch
    simhash64 over distinct texts."""
    from wikiextractor_spark.operators.dedup import simhash64
    from wikiextractor_spark.streaming import near_deduped_document_stream

    src = tmp_path / "docs_dup"
    src.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/documents.parquet", src / "b.parquet")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    q = (
        near_deduped_document_stream(spark, str(src))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)

    got = spark.read.parquet(str(out))
    batch_sigs = {
        r["simhash"]
        for r in simhash64(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
        ).collect()
    }
    assert got.count() == len(batch_sigs)
    assert {r["simhash"] for r in got.collect()} == batch_sigs


def test_incremental_near_dedup_across_batches(spark, tmp_path):
    """The foreachBatch incremental near-dedup must suppress Hamming-
    close docs ACROSS micro-batches (signature-equality streaming
    can't): batch 2's near-copy of a batch-1 doc is dropped via the
    pigeonhole join against the signature store, while its genuinely
    new doc survives."""
    from wikiextractor_spark.streaming import near_dedup_documents_incremental

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    )
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def doc(i, text):
        return (i, text, "en", "t", len(text))

    src = tmp_path / "in"
    src.mkdir()

    def land(df, name):
        # the streaming file source lists FILES, not spark output
        # dirs: write to scratch, move the single part file in
        import glob

        scratch = tmp_path / f"_scratch_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.copy(part, src / name)

    # batch 1: A, its exact copy B (in-batch dup), unrelated C
    land(
        spark.createDataFrame([doc(1, base), doc(2, base), doc(3, other)], schema),
        "f1.parquet",
    )

    out = tmp_path / "out"
    state = tmp_path / "state"
    # max_distance=6: the planted one-word edit of the 20-word doc
    # sits at Hamming 6 (deterministic — md5), and the unrelated docs
    # sit far beyond (~32 expected for disjoint vocabularies)
    q = near_dedup_documents_incremental(
        spark, str(src), str(out), str(tmp_path / "ckpt1"), str(state),
        max_distance=6,
    )
    _drain(q)
    first = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert first == {1, 3}  # in-batch chain rule kept the smaller id

    # batch 2 (separate file + restart): D = one-word edit of A
    # (near dup across batches), E = genuinely new
    near = base.replace("kappa", "changed")
    fresh = (
        "completely different words about completely different topics "
        "nothing shared with either earlier document at all here"
    )
    land(spark.createDataFrame([doc(10, near), doc(11, fresh)], schema),
         "f2.parquet")
    q = near_dedup_documents_incremental(
        spark, str(src), str(out), str(tmp_path / "ckpt1"), str(state),
        max_distance=6,
    )
    _drain(q)

    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert got == {1, 3, 11}, got  # 10 suppressed by the store join
    # the store holds exactly the survivors' signatures
    stored = {r["doc_id"] for r in spark.read.parquet(str(state)).collect()}
    assert stored == {1, 3, 11}
