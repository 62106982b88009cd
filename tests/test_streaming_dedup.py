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


def test_incremental_store_is_bucketed_and_pruned(spark, tmp_path):
    """The signature store must be hive-partitioned by bucket and the
    per-batch read must touch ONLY matching partition paths — the
    property that bounds a long-lived stream's per-batch read cost by
    bucket occupancy instead of store lifetime."""
    import glob
    import os

    from wikiextractor_spark.streaming import near_dedup_documents_incremental
    from wikiextractor_spark.streaming.dedup import read_store_buckets

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    texts = [
        (i, f"document number {i} with some distinct words {i * 7}",
         "en", "t", 40)
        for i in range(1, 9)
    ]
    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    spark.createDataFrame(texts, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(scratch))
    part = glob.glob(f"{scratch}/part-*.parquet")[0]
    shutil.copy(part, src / "f1.parquet")

    state = tmp_path / "state"
    q = near_dedup_documents_incremental(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(state),
    )
    _drain(q)

    # layout: batch_id=<n>/bucket=<b>/ hive partitions
    bucket_dirs = glob.glob(f"{state}/batch_id=*/bucket=*")
    assert bucket_dirs, os.listdir(state)
    present = sorted(
        {int(d.rsplit("bucket=", 1)[1]) for d in bucket_dirs}
    )
    assert len(present) >= 2  # 8 docs x 4 blocks spread over buckets

    # a pruned read scans files ONLY under the requested buckets
    want = present[:2]
    got_files = read_store_buckets(spark, str(state), want).inputFiles()
    assert got_files
    for f in got_files:
        assert any(f"bucket={b}/" in f for b in want), f
    # and the full read sees strictly more files than the pruned one
    all_files = read_store_buckets(spark, str(state), None).inputFiles()
    assert set(got_files) < set(all_files)


def test_incremental_transient_store_error_fails_batch(
    spark, tmp_path, monkeypatch
):
    """A transient store-read failure must FAIL the micro-batch (the
    checkpoint retries it) — never silently skip cross-batch dedup and
    emit near-duplicates.  Only path-not-found means 'first batch'."""
    import glob

    import wikiextractor_spark.streaming.dedup as sd

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = tmp_path / "in"
    src.mkdir()

    def land(df, name):
        scratch = tmp_path / f"_scratch_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.copy(part, src / name)

    land(
        spark.createDataFrame([(1, base, "en", "t", len(base))], schema),
        "f1.parquet",
    )
    out, ckpt, state = tmp_path / "out", tmp_path / "ckpt", tmp_path / "state"
    q = sd.near_dedup_documents_incremental(
        spark, str(src), str(out), str(ckpt), str(state), max_distance=6,
    )
    _drain(q)
    assert {r["doc_id"] for r in spark.read.parquet(str(out)).collect()} == {1}

    # batch 2 arrives while the store read hits a transient IO error
    near = base.replace("kappa", "changed")
    land(
        spark.createDataFrame([(10, near, "en", "t", len(near))], schema),
        "f2.parquet",
    )

    def _boom(*a, **kw):
        raise OSError("transient store outage")

    monkeypatch.setattr(sd, "read_store_buckets", _boom)
    q = sd.near_dedup_documents_incremental(
        spark, str(src), str(out), str(ckpt), str(state), max_distance=6,
    )
    with pytest.raises(Exception, match="transient store outage"):
        q.awaitTermination(120)
    # the failed batch committed nothing: no near-duplicate leaked
    assert {r["doc_id"] for r in spark.read.parquet(str(out)).collect()} == {1}

    # un-patched retry from the same checkpoint reprocesses the batch
    # and the store join suppresses the near-copy
    monkeypatch.undo()
    q = sd.near_dedup_documents_incremental(
        spark, str(src), str(out), str(ckpt), str(state), max_distance=6,
    )
    _drain(q)
    assert {r["doc_id"] for r in spark.read.parquet(str(out)).collect()} == {1}


def test_signature_store_compaction(spark, tmp_path):
    """Compaction must collapse the OLDER batch_id generations into
    one — the NEWEST numeric generation always stays untouched, so a
    batch whose checkpoint never committed can still replay with its
    own generation excluded — preserve the exact signature row set
    and bucket layout, and leave the stream suppressing near-dups."""
    import glob

    from wikiextractor_spark.streaming import (
        compact_signature_store,
        near_dedup_documents_incremental,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    )
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = tmp_path / "in"
    src.mkdir()

    def land(rows, name):
        scratch = tmp_path / f"_scratch_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(scratch))
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.copy(part, src / name)

    out, ckpt, state = tmp_path / "out", tmp_path / "ckpt", tmp_path / "state"
    texts = [(1, base), (3, other),
             (5, "third batch document with its very own words")]
    for i, (did, text) in enumerate(texts, 1):
        land([(did, text, "en", "t", 1)], f"f{i}.parquet")
        q = near_dedup_documents_incremental(
            spark, str(src), str(out), str(ckpt), str(state), max_distance=6)
        _drain(q)

    def gens():
        return sorted(glob.glob(f"{state}/batch_id=*"))

    def rows():
        return sorted(
            (r["doc_id"], r["simhash"], r["block_idx"], r["block_val"],
             r["bucket"])
            for r in spark.read.parquet(str(state)).collect()
        )

    assert len(gens()) == 3
    before = rows()
    # gens 0 and 1 fold into c3; the newest numeric gen (2) is kept
    assert compact_signature_store(spark, str(state)) == 2
    left = {g.rsplit("batch_id=", 1)[1] for g in gens()}
    assert left == {"2", "c3"}
    assert rows() == before
    # idempotent: only the kept-newest gen + one compacted gen remain
    assert compact_signature_store(spark, str(state)) == 0
    # one file per bucket in the compacted generation
    for bdir in glob.glob(f"{state}/batch_id=c3/bucket=*"):
        assert len(glob.glob(f"{bdir}/part-*.parquet")) == 1

    # the stream still suppresses near-dups against the compacted store
    near = base.replace("kappa", "changed")
    land([(10, near, "en", "t", 1),
          (11, "zebra quartz jungle velvet meadow copper sunset harbor "
               "granite willow ember falcon prism lantern orchid thunder",
           "en", "t", 1)], "f9.parquet")
    q = near_dedup_documents_incremental(
        spark, str(src), str(out), str(ckpt), str(state), max_distance=6)
    _drain(q)
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert got == {1, 3, 5, 11}, got


def test_compaction_preserves_uncommitted_batch_replayability(spark, tmp_path):
    """The data-loss window compaction must NOT have: batch N's store
    write landed but its checkpoint never committed; compaction runs;
    the restart replays batch N.  Because the newest generation is
    kept out of the compaction, the replay's exclude_gen=N still
    covers every one of its own signatures — the batch survives
    instead of self-deduping to nothing."""
    import glob

    from wikiextractor_spark.streaming import compact_signature_store
    from wikiextractor_spark.streaming.dedup import dedup_batch_against_store

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = spark.createDataFrame(
        [(1, "generation zero document words here", "en", "t", 1)], schema
    ).localCheckpoint(eager=True)
    b1 = spark.createDataFrame(
        [(2, "the crashed batch distinct content words", "en", "t", 1)], schema
    ).localCheckpoint(eager=True)
    state = tmp_path / "state"
    assert dedup_batch_against_store(spark, b0, str(state), 0).count() == 1
    # batch 1's store write lands (checkpoint commit then "crashes")
    assert dedup_batch_against_store(spark, b1, str(state), 1).count() == 1
    # operator compacts while the stream is stopped: gen 1 must be kept
    compact_signature_store(spark, str(state))
    kept = {g.rsplit("batch_id=", 1)[1] for g in glob.glob(f"{state}/batch_id=*")}
    assert "1" in kept
    # restart replays batch 1: its docs must survive
    replay = dedup_batch_against_store(spark, b1, str(state), 1)
    assert {r["doc_id"] for r in replay.collect()} == {2}


def test_replayed_batch_does_not_self_dedup(spark, tmp_path):
    """foreachBatch is at-least-once: a batch replayed after a crash
    mid-write must NOT join against its own partial store partition —
    that would see its own signatures at Hamming 0 and drop every doc.
    The store read excludes the current batch's own generation."""
    from wikiextractor_spark.streaming.dedup import dedup_batch_against_store

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    batch = spark.createDataFrame(
        [
            (1, "first document with its own words entirely", "en", "t", 1),
            (2, "second document sharing nothing with first", "en", "t", 1),
        ],
        schema,
    ).localCheckpoint(eager=True)
    state = tmp_path / "state"

    first = dedup_batch_against_store(spark, batch, str(state), 7, max_distance=6)
    assert {r["doc_id"] for r in first.collect()} == {1, 2}
    # the store now holds batch 7's signatures; the replay of batch 7
    # must survive identically, not self-dedup to nothing
    replay = dedup_batch_against_store(spark, batch, str(state), 7, max_distance=6)
    assert {r["doc_id"] for r in replay.collect()} == {1, 2}
    # while a LATER batch with a copy is still suppressed
    later = spark.createDataFrame(
        [(9, "first document with its own words entirely", "en", "t", 1)],
        schema,
    ).localCheckpoint(eager=True)
    out = dedup_batch_against_store(spark, later, str(state), 8, max_distance=6)
    assert out.count() == 0


def test_prepare_corpus_stream_end_to_end(spark, tmp_path):
    """The streaming corpus-prep flow must apply the full composition
    per micro-batch: lang filter, in-batch + cross-batch near dedup
    via the signature store, benchmark decontamination, chunking and
    packing — across two availableNow runs."""
    import glob

    from wikiextractor_spark.streaming import prepare_corpus_stream

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    german = (
        "der die das und ist nicht ein eine mit von zu auf fuer den "
        "dem des im am um an bei nach aus"
    )
    contaminated = (
        "held out evaluation sentence that must never reach training "
        "data at all in any form whatsoever"
    )
    fresh = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    )
    bench = spark.createDataFrame([(contaminated,)], "text string")

    src = tmp_path / "in"
    src.mkdir()

    def land(rows, name):
        scratch = tmp_path / f"_scratch_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(scratch))
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.copy(part, src / name)

    def run():
        q = prepare_corpus_stream(
            spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
            str(tmp_path / "state"),
            target_lang="en", dedup="near", max_distance=6,
            benchmark=bench, decontam_ngram=3, decontam_threshold=0.5,
            chunk_tokens=8, pack_budget=16,
            stats_dir=str(tmp_path / "stats"),
        )
        assert q.awaitTermination(120), "stream did not drain"

    def doc(i, text):
        return (i, text, "xx", "t", len(text))

    # batch 1: A (en), exact copy of A (in-batch dup), German doc
    land([doc(1, base), doc(2, base), doc(3, german)], "f1.parquet")
    run()
    out1 = spark.read.parquet(str(tmp_path / "out"))
    assert {r["doc_id"] for r in out1.collect()} == {1}
    # chunked + packed schema with the budget invariant
    assert {"chunk_no", "chunk", "n_tokens", "chunk_id", "pack_id",
            "over_budget"} <= set(out1.columns)
    sums = (
        out1.filter(~F.col("over_budget"))
        .groupBy("batch_id", "pack_id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    assert sums and all(r["s"] <= 16 for r in sums)
    # the 20-word doc chunks into ceil(20/8) = 3 chunks
    assert out1.count() == 3

    # batch 2: near-copy of A (cross-batch suppressed), contaminated
    # doc (decontam drop), fresh doc (survives)
    land(
        [doc(10, base.replace("kappa", "edited")), doc(11, contaminated),
         doc(12, fresh)],
        "f2.parquet",
    )
    run()
    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {1, 12}, got

    # per-batch observability: an in/out corpus_stats row pair per
    # micro-batch, keyed by batch_id — both batches landed 3 docs and
    # kept exactly 1 through the gates + dedup + decontam
    stats = {
        (r["batch_id"], r["stage"]): r["n_docs"]
        for r in spark.read.parquet(str(tmp_path / "stats")).collect()
    }
    batches = sorted({b for b, _ in stats})
    assert len(batches) == 2
    for b in batches:
        assert stats[(b, "in")] == 3 and stats[(b, "out")] == 1


def test_prepare_corpus_stream_fully_filtered_batch(spark, tmp_path):
    """A micro-batch whose docs ALL fail the narrow filters must
    drain cleanly (empty dedup join, empty store write, empty output
    partition) — not crash the stream."""
    import glob

    from wikiextractor_spark.streaming import prepare_corpus_stream

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    german = (
        "der die das und ist nicht ein eine mit von zu auf fuer den "
        "dem des im am um an bei nach aus"
    )
    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    spark.createDataFrame(
        [(1, german, "de", "t", 1)], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(scratch))
    shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0], src / "f1.parquet")

    q = prepare_corpus_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), target_lang="en", dedup="near",
        chunk_tokens=8,
    )
    assert q.awaitTermination(120), "stream did not drain"
    out_files = glob.glob(f"{tmp_path}/out/batch_id=*/part-*.parquet")
    if out_files:  # empty write is fine; rows must be zero either way
        assert spark.read.parquet(str(tmp_path / "out")).count() == 0


def test_store_listing_skips_malformed_partition_dirs(spark, tmp_path):
    """Foreign directories in the store tree (non-numeric or
    int()-rejected bucket values, stray names) are skipped by the
    listing, never crash it."""
    import glob

    from wikiextractor_spark.streaming.dedup import (
        dedup_batch_against_store,
        read_store_buckets,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    batch = spark.createDataFrame(
        [(1, "some document words here now", "en", "t", 1)], schema
    ).localCheckpoint(eager=True)
    state = tmp_path / "state"
    dedup_batch_against_store(spark, batch, str(state), 0)
    # plant malformed partition dirs a foreign writer might leave
    for bad in ("bucket=--5", "bucket=x9", "bucket=³", "_temporary"):
        (state / "batch_id=0" / bad).mkdir(parents=True, exist_ok=True)
    # ...and a stray FILE whose name looks like a partition dir: the
    # listing must filter on isDirectory, not just the name prefix
    (state / "batch_id=0" / "bucket=3").write_bytes(b"not a directory")
    got = read_store_buckets(spark, str(state), None)
    assert got is not None and got.count() > 0
    # and a follow-up batch still runs end to end
    batch2 = spark.createDataFrame(
        [(2, "entirely different second doc content", "en", "t", 1)], schema
    ).localCheckpoint(eager=True)
    out = dedup_batch_against_store(spark, batch2, str(state), 1)
    assert out.count() == 1


def test_compaction_removes_empty_generations(spark, tmp_path):
    """All-empty compactable generations (fully-filtered micro-batches)
    are still DELETED — the store's directory count must not grow with
    stream lifetime."""
    import glob

    from wikiextractor_spark.streaming import compact_signature_store
    from wikiextractor_spark.streaming.dedup import dedup_batch_against_store

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    empty = spark.createDataFrame([], schema)
    state = tmp_path / "state"
    # three generations: two empty + one real (the newest, kept)
    for bid in (0, 1):
        dedup_batch_against_store(
            spark, empty.localCheckpoint(eager=True), str(state), bid
        )
    real = spark.createDataFrame(
        [(5, "real content document words", "en", "t", 1)], schema
    ).localCheckpoint(eager=True)
    dedup_batch_against_store(spark, real, str(state), 2)

    assert compact_signature_store(spark, str(state)) == 2
    left = {p.rsplit("batch_id=", 1)[1] for p in glob.glob(f"{state}/batch_id=*")}
    assert left == {"2"}  # empty gens deleted, nothing to rewrite


def test_prepare_corpus_stream_lm_gate(spark, tmp_path):
    """The pre-fitted LM gate works inside the streaming flow: the
    gibberish doc is dropped per micro-batch under the reference
    model, common-vocabulary docs survive."""
    import glob

    from wikiextractor_spark.functions.lmquality import (
        doc_logprob_scores,
        fit_unigram_lm,
    )
    from wikiextractor_spark.streaming import prepare_corpus_stream

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    ref = spark.createDataFrame(
        [(i, "common reference words shared across documents", "en", "t", 1)
         for i in range(5)],
        schema,
    )
    lm = fit_unigram_lm(ref, vocab_size=50)
    good = (1, "common words shared across reference documents", "en", "t", 1)
    bad = (2, "zzqqx wvvkj pplmn oorrt uuyyw", "en", "t", 1)
    scores = {
        r["doc_id"]: r["mean_logp"]
        for r in doc_logprob_scores(
            spark.createDataFrame([good, bad], schema), lm
        ).collect()
    }
    cut = (scores[1] + scores[2]) / 2

    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    spark.createDataFrame([good, bad], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(scratch))
    shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0], src / "f1.parquet")

    q = prepare_corpus_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), logprob_lm=lm, min_mean_logp=cut,
        dedup="near",
    )
    assert q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {1}, got


def test_prepare_corpus_stream_classifier_gate(spark, tmp_path):
    """The pre-fitted trained-classifier gate works inside the
    streaming flow: the noise doc is dropped per micro-batch, the
    wiki-like doc survives."""
    import glob

    from wikiextractor_spark.functions.classifier import DEFAULT_MODEL
    from wikiextractor_spark.streaming import prepare_corpus_stream

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    good = (1, "the history of the village is a record of the people "
               "and the land with a school by the river", "en", "t", 1)
    bad = (2, "@#$% !!%^ 1234567 &&** 98765 ((&& 55555 ^^%$ 000111",
           "en", "t", 1)

    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    spark.createDataFrame([good, bad], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(scratch))
    shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0], src / "f1.parquet")

    q = prepare_corpus_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), classifier_model=DEFAULT_MODEL,
        dedup="near",
    )
    assert q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {1}, got


def test_prepare_corpus_stream_dsir_gate(spark, tmp_path):
    """The PRE-FITTED DSIR importance gate works inside the streaming
    flow: the target-unlike doc is dropped per micro-batch, the
    target-like doc survives, with the kept set equal to the batch
    operator's over the same weights."""
    import glob

    from wikiextractor_spark.operators import dsir
    from wikiextractor_spark.streaming import prepare_corpus_stream

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    good = (1, "the cat sat on the mat near the cat mat", "en", "t", 1)
    bad = (2, "quantum flux capacitors invert neutron polarity", "en", "t", 1)
    docs = spark.createDataFrame([good, bad], schema)
    target = spark.createDataFrame(
        [(i, "the cat sat on the mat", "en", "t", 1) for i in range(20)],
        schema,
    )
    opts = {"n": 2, "buckets": 64, "salt": "t"}
    w = dsir.importance_weights(
        dsir.bucket_histogram(target, **opts),
        dsir.bucket_histogram(docs, **opts),
        opts["buckets"],
    ).localCheckpoint(eager=True)
    batch_kept = {
        r["doc_id"]
        for r in dsir.select_by_weight(
            dsir.dsir_scores(docs, w, **opts), 0
        ).collect()
    }
    assert batch_kept == {1}

    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    docs.coalesce(1).write.mode("overwrite").parquet(str(scratch))
    shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0], src / "f1.parquet")

    q = prepare_corpus_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), dsir_weights=w, min_dsir_weight_micro=0,
        dsir_opts=opts, dedup="near",
    )
    assert q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == batch_kept, got


def test_prepare_corpus_stream_content_gate(spark, tmp_path):
    """The pre-fitted hashed content model gates per micro-batch."""
    import glob

    from wikiextractor_spark.functions.classifier import fit_hashed_classifier
    from wikiextractor_spark.streaming import prepare_corpus_stream

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    good_text = "history of the village river school music people land"
    bad_text = "casino jackpot winner bonus prize lottery claim now"
    labeled = spark.createDataFrame(
        [(i, good_text, 1) for i in range(10)]
        + [(100 + i, bad_text, 0) for i in range(10)],
        "doc_id long, text string, label int",
    )
    w, prior = fit_hashed_classifier(labeled)

    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    spark.createDataFrame(
        [(1, good_text, "en", "t", 1), (2, bad_text, "en", "t", 1)], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(scratch))
    shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0], src / "f1.parquet")

    q = prepare_corpus_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), content_weights=(w, prior),
        min_content_logit=0.0, dedup="near",
    )
    assert q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {1}, got


def test_prepare_corpus_stream_gopher_parity_with_batch(spark, tmp_path):
    """The Gopher gate is reachable per micro-batch, and one batch
    through the streaming composition keeps EXACTLY the documents the
    batch composition keeps with the same flags (VERDICT r7 #8)."""
    import glob

    from wikiextractor_spark.operators.corpus import prepare_corpus
    from wikiextractor_spark.streaming import prepare_corpus_stream

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stop_rich = (
        "the history of the village is a record of the people and the "
        "land that came to be known with the river and the school "
    ) * 4  # > 50 words, stopword-rich, alpha-heavy
    rows = [
        (1, stop_rich.strip(), "en", "t", 1),               # passes
        (2, "too few words here", "en", "t", 1),            # n_words < 50
        (3, ("#tag " * 60).strip(), "en", "t", 1),          # symbol ratio
        (4, stop_rich.strip() + " extra tail words", "en", "t", 1),  # passes
    ]
    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    batch_df = spark.createDataFrame(rows, schema)
    batch_df.coalesce(1).write.mode("overwrite").parquet(str(scratch))
    shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0], src / "f1.parquet")

    q = prepare_corpus_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), gopher=True, dedup=None,
    )
    assert q.awaitTermination(120)
    streamed = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = {
        r["doc_id"]
        for r in prepare_corpus(batch_df, gopher=True, dedup=None).collect()
    }
    assert streamed == batch
    assert 2 not in streamed and 3 not in streamed
    assert {1, 4} <= streamed


def test_index_embeddings_stream_and_replay_idempotence(spark, tmp_path):
    """Streaming IVF maintenance: new embedding files append to a
    pre-built index per micro-batch; a replayed batch id is skipped
    (the append would otherwise double-insert); a missing index fails
    fast; served neighbors include streamed vectors."""
    import glob

    from wikiextractor_spark.operators.similarity import (
        ann_ivf_search_vectors,
        build_ivf_index,
        ivf_index_stats,
    )
    from wikiextractor_spark.streaming import (
        add_embeddings_batch,
        index_embeddings_stream,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))")
        .alias("embedding")
    ).localCheckpoint(eager=True)
    base = emb.filter(F.col("vec_id") < 30)
    extra = emb.filter((F.col("vec_id") >= 30) & (F.col("vec_id") < 45))

    idx = str(tmp_path / "stream_idx")
    build_ivf_index(base, idx, k=2, iters=1)

    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    extra.coalesce(1).write.mode("overwrite").parquet(str(scratch))
    shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0], src / "f1.parquet")

    q = index_embeddings_stream(
        spark, str(src), idx, str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(120)
    total = sum(
        r["n_vectors"] for r in ivf_index_stats(spark, idx).collect()
    )
    assert total == 45

    # a streamed vector is servable
    target = extra.filter(F.col("vec_id") == 40).collect()[0]
    got = ann_ivf_search_vectors(
        spark, idx, [(9000, list(target["embedding"]))], k=1, nprobe=2
    ).collect()
    assert got[0]["neighbor_id"] == 40 and got[0]["cos"] == 1.0

    # replaying an APPLIED batch id is a no-op (ledger hit)
    assert add_embeddings_batch(spark, idx, extra, batch_id=0) is False
    total2 = sum(
        r["n_vectors"] for r in ivf_index_stats(spark, idx).collect()
    )
    assert total2 == 45

    # a NEW batch id applies; an empty batch is ledgered as applied
    more = emb.filter((F.col("vec_id") >= 45) & (F.col("vec_id") < 50))
    assert add_embeddings_batch(spark, idx, more, batch_id=7) is True
    assert add_embeddings_batch(spark, idx, more, batch_id=7) is False
    empty = emb.filter(F.col("vec_id") < 0)
    assert add_embeddings_batch(spark, idx, empty, batch_id=8) is True
    assert add_embeddings_batch(spark, idx, empty, batch_id=8) is False

    # missing index fails fast at start
    with pytest.raises(Exception):
        index_embeddings_stream(
            spark, str(src), str(tmp_path / "no_such_idx"),
            str(tmp_path / "ckpt2"),
        )


def test_ingest_ledger_lifecycle(spark, tmp_path):
    """Review findings r8: a rebuild clears the ingest ledger (a
    stale one would silently skip the new stream's renumbered
    batches), and compact_ingest_log folds the one-file-per-batch
    ledger into a single file without losing ids."""
    import glob as _glob

    from wikiextractor_spark.operators.similarity import build_ivf_index
    from wikiextractor_spark.streaming import (
        add_embeddings_batch,
        compact_ingest_log,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("embedding"),
    ).localCheckpoint(eager=True)

    idx = str(tmp_path / "ledger_idx")
    build_ivf_index(emb.filter(F.col("vec_id") < 20), idx, k=2, iters=0)
    batch = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 25))
    for b in (0, 1, 2):
        assert add_embeddings_batch(spark, idx, batch.limit(1 + b),
                                    batch_id=b) is True
    assert compact_ingest_log(spark, idx) == 3
    assert len(_glob.glob(f"{idx}/ingest_log/part-*.parquet")) == 1
    # compaction preserves the skip set
    assert add_embeddings_batch(spark, idx, batch, batch_id=1) is False

    # REBUILD clears the ledger: batch 0 of the new lineage applies
    build_ivf_index(emb.filter(F.col("vec_id") < 20), idx, k=2, iters=0)
    assert add_embeddings_batch(spark, idx, batch, batch_id=0) is True


def test_add_embeddings_batch_single_materialization(spark, sf_dir,
                                                     tmp_path, monkeypatch):
    """VERDICT r8 item 6: the per-batch emptiness pre-check is gone —
    add_embeddings_batch runs exactly ONE take() (the post-checkpoint
    probe inside ivf_index_add, a driver-side block read), and an
    EMPTY batch skips both index writes (no new files) while still
    ledgering exact-once."""
    import glob as _glob

    from wikiextractor_spark.operators.similarity import (
        build_ivf_index,
        load_ivf_centroids,
        load_pq_books,
        load_sq_codec,
    )
    from wikiextractor_spark.streaming import add_embeddings_batch

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("embedding"),
    ).localCheckpoint(eager=True)

    idx = str(tmp_path / "probe_idx")
    build_ivf_index(emb.filter(F.col("vec_id") < 20), idx, k=2, iters=0)
    artifacts = (
        load_ivf_centroids(spark, idx),
        load_pq_books(spark, idx),
        load_sq_codec(spark, idx),
    )

    calls = []
    _DF = type(emb)  # concrete class (DataFrame is abstract in Spark 4)
    orig_take = _DF.take

    def counted_take(self, num):
        calls.append(num)
        return orig_take(self, num)

    monkeypatch.setattr(_DF, "take", counted_take)

    # review r9: with the 3-tuple artifact cache, appends make ZERO
    # per-batch artifact reads (absent artifacts pass as the
    # probe-free VERIFIED_ABSENT marker, not as probed None)
    from wikiextractor_spark.operators import similarity as _sim

    probes = []
    for loader in ("load_pq_books", "load_sq_codec", "load_ivf_centroids"):
        orig = getattr(_sim, loader)
        monkeypatch.setattr(
            _sim, loader,
            (lambda o, n: lambda *a, **k: (probes.append(n), o(*a, **k))[1])(
                orig, loader
            ),
        )

    batch = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 25))
    applied: set[int] = set()
    assert add_embeddings_batch(
        spark, idx, batch, batch_id=0, _applied=applied,
        _artifacts=artifacts,
    ) is True
    assert calls == [1]  # ONE probe, inside ivf_index_add
    assert probes == []  # zero artifact reads with the cache supplied

    # empty batch: ledgered, but neither index table gains a file
    before_v = sorted(_glob.glob(f"{idx}/vectors/**/*.parquet",
                                 recursive=True))
    before_a = sorted(_glob.glob(f"{idx}/assignments/*.parquet"))
    calls.clear()
    empty = emb.filter(F.col("vec_id") < 0)
    assert add_embeddings_batch(
        spark, idx, empty, batch_id=1, _applied=applied,
        _artifacts=artifacts,
    ) is True
    assert sorted(_glob.glob(f"{idx}/vectors/**/*.parquet",
                             recursive=True)) == before_v
    assert sorted(_glob.glob(f"{idx}/assignments/*.parquet")) == before_a
    assert calls == [1]
    assert add_embeddings_batch(
        spark, idx, empty, batch_id=1, _applied=applied,
        _artifacts=artifacts,
    ) is False


def test_prepare_corpus_stream_url_blocklist_parity_with_batch(
        spark, tmp_path):
    """VERDICT r8 item 4: the URL/domain gate is reachable per
    micro-batch via schema=DOCUMENTS_URL_SCHEMA (the blocklist is a
    static broadcast, stateless per batch), one batch through the
    streaming composition keeps EXACTLY the documents the batch
    composition keeps with the same flags, and a blocklist without a
    url column in the schema fails fast at stream definition."""
    import glob

    from wikiextractor_spark.operators.corpus import prepare_corpus
    from wikiextractor_spark.streaming import (
        DOCUMENTS_URL_SCHEMA,
        prepare_corpus_stream,
    )

    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long, url string")
    rows = [
        (1, "kept text one", "en", "t", 1, "https://clean.org/a"),
        (2, "blocked text", "en", "t", 1, "https://spam.bad.net/x"),
        (3, "blocked subdomain", "en", "t", 1, "https://deep.bad.net/y"),
        (4, "kept text two", "en", "t", 1, "https://fine.io/z"),
        (5, "no url row", "en", "t", 1, None),
    ]
    src = tmp_path / "in"
    src.mkdir()
    scratch = tmp_path / "_scratch"
    batch_df = spark.createDataFrame(rows, schema)
    batch_df.coalesce(1).write.mode("overwrite").parquet(str(scratch))
    shutil.copy(glob.glob(f"{scratch}/part-*.parquet")[0], src / "f1.parquet")

    q = prepare_corpus_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), schema=DOCUMENTS_URL_SCHEMA,
        url_blocklist=["bad.net"], dedup=None,
    )
    assert q.awaitTermination(120)
    streamed = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = {
        r["doc_id"]
        for r in prepare_corpus(
            batch_df, url_blocklist=["bad.net"], dedup=None
        ).collect()
    }
    assert streamed == batch
    assert streamed == {1, 4, 5}  # NULL-url rows pass (stated contract)

    # blocklist without a url column in the schema: fails at stream
    # DEFINITION, before any batch runs — for BOTH schema forms the
    # reader accepts (StructType and DDL string; review r9)
    with pytest.raises(ValueError, match="no 'url' column"):
        prepare_corpus_stream(
            spark, str(src), str(tmp_path / "out2"),
            str(tmp_path / "ckpt2"), str(tmp_path / "state2"),
            url_blocklist=["bad.net"], dedup=None,
        )
    with pytest.raises(ValueError, match="no 'url' column"):
        prepare_corpus_stream(
            spark, str(src), str(tmp_path / "out3"),
            str(tmp_path / "ckpt3"), str(tmp_path / "state3"),
            schema="doc_id long, text string",
            url_blocklist=["bad.net"], dedup=None,
        )
    # a DDL-string schema CARRYING url passes the guard
    q2 = prepare_corpus_stream(
        spark, str(src), str(tmp_path / "out4"),
        str(tmp_path / "ckpt4"), str(tmp_path / "state4"),
        schema=schema, url_blocklist=["bad.net"], dedup=None,
    )
    assert q2.awaitTermination(120)
    assert {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out4")).collect()
    } == {1, 4, 5}


def test_prepare_corpus_stream_normalize_gate(spark, tmp_path):
    """normalize_form flows into each micro-batch's narrow-stage
    composition: composed/decomposed twins collapse under the
    cross-batch near-dedup store because they reach it byte-equal."""
    import glob

    from wikiextractor_spark.streaming import prepare_corpus_stream

    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    base = (
        "café alpha beta gamma delta epsilon zeta eta theta "
        "iota kappa lambda mu nu xi omicron pi rho sigma tau"
    )
    twin = (
        "café alpha beta gamma delta epsilon zeta eta theta "
        "iota kappa lambda mu nu xi omicron pi rho sigma tau"
    )
    src = tmp_path / "in"
    src.mkdir()

    def land(rows, name):
        scratch = tmp_path / f"_scratch_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(scratch))
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.copy(part, src / name)

    def run():
        q = prepare_corpus_stream(
            spark, str(src), str(tmp_path / "out"),
            str(tmp_path / "ckpt"), str(tmp_path / "state"),
            normalize_form="NFC", dedup="near", max_distance=0,
        )
        assert q.awaitTermination(120), "stream did not drain"

    land([(1, base, "en", "t", len(base))], "f1.parquet")
    run()
    # the decomposed twin arrives in a LATER batch: only NFC makes it
    # byte-equal to the stored signature (distance 0)
    land([(2, twin, "en", "t", len(twin))], "f2.parquet")
    run()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert {r["doc_id"] for r in out.collect()} == {1}
    # and the kept text is the NFC form
    kept = out.collect()[0]["text"]
    assert "café" in kept and "café" not in kept


def test_prepare_corpus_stream_invalid_normalize_fails_at_definition(
    spark, tmp_path,
):
    from wikiextractor_spark.streaming import prepare_corpus_stream

    (tmp_path / "in").mkdir()
    with pytest.raises(ValueError, match="form must be one of"):
        prepare_corpus_stream(
            spark, str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"), str(tmp_path / "state"),
            normalize_form="NFCC",
        )
