"""Streaming crawl-archive ingestion (late r10): manifest-driven
WET/WARC → documents-parquet stream, exact-once via per-batch
partition overwrite, same kernels as batch ingest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.streaming.crawl import crawl_documents_stream

DATE = "2021-06-01T12:00:00Z"


def _http(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n\r\n" + body
    )


def _response_record(url: str, http: bytes) -> bytes:
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + DATE.encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )


def _conversion_record(url: str, text: bytes) -> bytes:
    return (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + DATE.encode() + b"\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(text)).encode() + b"\r\n\r\n"
        + text + b"\r\n\r\n"
    )


def _warc_fixture(tmp_path, n_archives: int = 2):
    """n archives + one manifest line each; returns dirs."""
    arch = tmp_path / "archives"
    man = tmp_path / "manifest"
    arch.mkdir()
    man.mkdir()
    for i in range(n_archives):
        body = (
            f"<html lang='en'><body><p>Archive {i} carries plenty of "
            f"ordinary prose for page one of the crawl.</p>"
            f"</body></html>"
        ).encode()
        p = arch / f"crawl-{i}.warc"
        p.write_bytes(
            _response_record(f"http://ex.org/{i}", _http(body))
        )
        (man / f"done-{i}.txt").write_text(str(p) + "\n")
    return arch, man


def test_crawl_stream_warc_end_to_end(spark, tmp_path):
    _arch, man = _warc_fixture(tmp_path)
    out = tmp_path / "docs"
    q = crawl_documents_stream(
        spark, str(man), str(out), str(tmp_path / "ckpt"),
        source="warc", with_meta=True,
    )
    assert q.awaitTermination(120), "stream did not drain"
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 2
    by_url = {r["url"]: r for r in rows}
    assert "Archive 0" in by_url["http://ex.org/0"]["text"]
    assert by_url["http://ex.org/1"]["declared_lang"] == "en"
    assert all(r["source"] == "warc" for r in rows)
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    # batch_id partitioning (the exact-once overwrite grain)
    assert any(
        d.startswith("batch_id=") for d in os.listdir(out)
    )


def test_crawl_stream_replay_same_checkpoint_is_exact_once(spark, tmp_path):
    """The ACTUAL replay contract (r11 ADVICE rescope): resuming from
    the SAME checkpoint neither reprocesses a committed batch nor
    duplicates rows — and new manifests arriving between runs land in
    their own batch_id partition alongside the first run's."""
    _arch, man = _warc_fixture(tmp_path)
    out = tmp_path / "docs"
    ckpt = str(tmp_path / "ckpt")
    q = crawl_documents_stream(
        spark, str(man), str(out), ckpt, source="warc",
    )
    assert q.awaitTermination(120)
    # resume 1: nothing new → committed batches are not re-run
    q = crawl_documents_stream(
        spark, str(man), str(out), ckpt, source="warc",
    )
    assert q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 2
    assert len({r["doc_id"] for r in rows}) == 2
    # resume 2: a manifest published between runs is ingested
    # incrementally into a NEW batch partition
    arch = tmp_path / "archives"
    body = b"<html><body><p>Late archive page.</p></body></html>"
    p = arch / "crawl-late.warc"
    p.write_bytes(_response_record("http://ex.org/late", _http(body)))
    (tmp_path / "manifest" / "done-late.txt").write_text(str(p) + "\n")
    q = crawl_documents_stream(
        spark, str(man), str(out), ckpt, source="warc",
    )
    assert q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 3
    assert len({r["doc_id"] for r in rows}) == 3


def test_crawl_stream_same_batching_rerun_rewrites_partitions(
    spark, tmp_path
):
    """A fresh-checkpoint re-run with IDENTICAL batch composition
    rewrites the same batch_id partitions in place — row set
    unchanged.  Scoped deliberately (r11 ADVICE): with a different
    maxFilesPerTrigger, or manifests that arrived between the runs,
    archives would land in different batch_ids and the first run's
    stale partitions would survive; the delivery contract covers
    same-checkpoint replays (the test above), this pins only the
    same-batching case."""
    _arch, man = _warc_fixture(tmp_path)
    out = tmp_path / "docs"
    for ckpt in ("c1", "c2"):
        q = crawl_documents_stream(
            spark, str(man), str(out), str(tmp_path / ckpt),
            source="warc",
        )
        assert q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 2
    assert len({r["doc_id"] for r in rows}) == 2


def test_crawl_stream_wet_mode(spark, tmp_path):
    arch = tmp_path / "a"
    man = tmp_path / "m"
    arch.mkdir()
    man.mkdir()
    p = arch / "x.wet"
    p.write_bytes(
        _conversion_record("http://ex.org/w", b"wet text payload")
    )
    (man / "done.txt").write_text(str(p) + "\n")
    q = crawl_documents_stream(
        spark, str(man), str(tmp_path / "docs"),
        str(tmp_path / "ckpt"), source="wet",
    )
    assert q.awaitTermination(120)
    r = spark.read.parquet(str(tmp_path / "docs")).first()
    assert r["text"] == "wet text payload"
    assert r["source"] == "wet"


def test_crawl_stream_bad_source_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="source must be"):
        crawl_documents_stream(
            spark, str(tmp_path), str(tmp_path / "o"),
            str(tmp_path / "c"), source="xml",
        )


def test_crawl_stream_missing_archive_fails_fast(spark, tmp_path):
    """A manifest line naming an absent archive must surface as a
    stream error, never a silent skip."""
    man = tmp_path / "m"
    man.mkdir()
    (man / "done.txt").write_text(str(tmp_path / "nope.warc") + "\n")
    q = crawl_documents_stream(
        spark, str(man), str(tmp_path / "docs"),
        str(tmp_path / "ckpt"), source="warc",
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)
        q.processAllAvailable()


def test_crawl_stream_composes_with_corpus_stream(spark, tmp_path):
    """The stated composition: crawl stream output read back as a
    document stream (schema over emitted columns, partitions globbed
    so batch_id stays out of the schema) through one
    prepare_corpus_stream micro-batch."""
    from wikiextractor_spark.streaming.corpus import prepare_corpus_stream

    _arch, man = _warc_fixture(tmp_path)
    out = tmp_path / "docs"
    q = crawl_documents_stream(
        spark, str(man), str(out), str(tmp_path / "c1"), source="warc",
    )
    assert q.awaitTermination(120)
    q2 = prepare_corpus_stream(
        spark,
        f"{out}/batch_id=*",
        str(tmp_path / "corpus"),
        str(tmp_path / "c2"),
        str(tmp_path / "state"),
        schema=(
            "doc_id long, url string, text string, "
            "source string, n_chars long"
        ),
        dedup=None,
    )
    assert q2.awaitTermination(120)
    kept = spark.read.parquet(str(tmp_path / "corpus"))
    assert kept.count() == 2
    assert "batch_id" in kept.columns  # partition key of the corpus sink
