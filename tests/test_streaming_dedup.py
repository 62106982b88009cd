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
