"""JSONL document source (sources/jsonl.py): explicit-schema scan,
corrupt-record quarantine, and round-trip parity with the parquet
documents table."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.sources import read_documents_jsonl, split_corrupt

CORRUPT_LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"',  # truncated
    "not json at all",
    '{"doc_id": "NaN...',
]


@pytest.fixture()
def jsonl_dir(tmp_path, spark, sf_dir):
    """The real documents table re-serialized as two JSONL part files
    (the multi-file scale layout) with corrupt lines spliced in."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    d = tmp_path / "docs_jsonl"
    d.mkdir()
    half = len(docs) // 2
    for part, rows in (("part-0.jsonl", docs[:half]), ("part-1.jsonl", docs[half:])):
        with open(d / part, "w") as f:
            for r in rows:
                f.write(json.dumps(r.asDict()) + "\n")
    with open(d / "part-1.jsonl", "a") as f:
        for line in CORRUPT_LINES:
            f.write(line + "\n")
    return d


def test_jsonl_round_trip(spark, jsonl_dir, sf_dir):
    good, quarantine = split_corrupt(
        read_documents_jsonl(spark, str(jsonl_dir))
    )
    pq = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert good.count() == pq.count()
    # value-level parity on a stable projection
    a = {(r["doc_id"], r["text"]) for r in good.select("doc_id", "text").collect()}
    b = {(r["doc_id"], r["text"]) for r in pq.select("doc_id", "text").collect()}
    assert a == b


def test_jsonl_quarantine_captures_raw_lines(spark, jsonl_dir):
    _good, quarantine = split_corrupt(
        read_documents_jsonl(spark, str(jsonl_dir))
    )
    raw = sorted(r["raw_line"] for r in quarantine.collect())
    assert raw == sorted(CORRUPT_LINES)


def test_jsonl_no_silent_loss(spark, jsonl_dir):
    """good + quarantine exactly partitions the input lines."""
    df = read_documents_jsonl(spark, str(jsonl_dir))
    good, quarantine = split_corrupt(df)
    n_lines = sum(
        1
        for p in jsonl_dir.iterdir()
        for _line in open(p)
    )
    assert good.count() + quarantine.count() == n_lines


def test_jsonl_schema_is_declared_not_inferred(spark, jsonl_dir):
    got = read_documents_jsonl(spark, str(jsonl_dir))
    assert [f.name for f in got.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars", "_corrupt_record"
    ]
    assert got.schema["doc_id"].dataType.simpleString() == "bigint"
