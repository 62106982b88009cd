"""Extra semantic pins beyond the generic oracle compare."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikiextractor_spark.queries import REGISTRY


def test_stream_matches_batch_rollup(spark):
    """The streaming hourly rollup (availableNow, append-mode file
    sink, 1s watermark) must equal the batch ev_hourly_rollup on every
    CLOSED window — i.e. every window whose end precedes the final
    watermark (max event time - 1s).  Later windows are legitimately
    withheld by append-mode semantics."""
    import datetime

    from wikiextractor_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    # the slot is family-discriminated since r10 (the 'corpus' family
    # carries URL-gate survivors); this pin is about the hourly rollup
    stream = REGISTRY["st_stream_hourly"][0](spark, sf).filter(
        F.col("family") == "hourly"
    )
    batch = REGISTRY["ev_hourly_rollup"][0](spark, sf)
    s = {(r["hour_s"], r["event_type"]): r["n_events"] for r in stream.collect()}
    b = {(r["hour_s"], r["event_type"]): r["n_events"] for r in batch.collect()}

    max_ts = load_table(spark, sf, "events").agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - datetime.timedelta(seconds=1)
    expected = {
        k: v
        for k, v in b.items()
        if datetime.datetime.strptime(k[0], "%Y-%m-%d %H:%M:%S")
        + datetime.timedelta(hours=1)
        <= cutoff
    }
    assert s == expected
    assert len(s) > 0


def test_rollup_has_grand_total(spark):
    df = REGISTRY["rel_grouping_sets"][0](spark, "/root/testdata/sf0.001")
    rows = [r for r in df.collect() if r["family"] == "rollup"]
    grand = [r for r in rows if r["k1"] is None and r["k2"] is None]
    assert len(grand) == 1
    assert grand[0]["n"] == sum(
        r["n"] for r in rows if r["k1"] is not None and r["k2"] is not None
    )
    cube = [
        r
        for r in REGISTRY["rel_grouping_sets"][0](
            spark, "/root/testdata/sf0.001"
        ).collect()
        if r["family"] == "cube"
    ]
    # cube emits all 4 grouping combinations incl. the grand total
    assert any(r["k1"] is None and r["k2"] is None for r in cube)
    assert any(r["k1"] is not None and r["k2"] is None for r in cube)
    assert any(r["k1"] is None and r["k2"] is not None for r in cube)


def _stream_sessions(spark, src_dir, query_name, **kwargs):
    """Run the stateful sessionizer availableNow into a memory sink
    (update mode) and keep the LAST emit per (user, sess_id)."""
    from wikiextractor_spark.streaming import sessionize_stream

    sess = sessionize_stream(spark, src_dir, **kwargs)
    q = (
        sess.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {}
    marker = {}
    # keep the row with the LARGEST last_ts_us emit marker per key —
    # a monotone merge rule independent of the sink's scan order (an
    # unordered scan may return earlier-batch snapshots later)
    for r in spark.sql(f"SELECT * FROM {query_name}").collect():
        k = (r["user_id"], r["sess_id"])
        if k not in marker or r["last_ts_us"] >= marker[k]:
            marker[k] = r["last_ts_us"]
            out[k] = (r["n_events"], r["duration_s"])
    return out


def _batch_sessions(spark, sf):
    batch = REGISTRY["ev_sessionize"][0](spark, sf)
    return {
        (r["user_id"], r["sess_id"]): (r["n_events"], r["duration_s"])
        for r in batch.collect()
    }


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization == the batch window-SQL
    sessionize after keeping each session's final emit."""
    import shutil

    sf = "/root/testdata/sf0.001"
    src = tmp_path / "ev_single"
    src.mkdir()
    shutil.copy(f"{sf}/events.parquet", src / "events.parquet")
    got = _stream_sessions(spark, str(src), "sess_single")
    assert got == _batch_sessions(spark, sf)


def test_stateful_sessionize_state_spans_batches(spark, tmp_path):
    """Split the events by time into two files processed as separate
    micro-batches (maxFilesPerTrigger=1): sessions crossing the split
    must be stitched by the carried GroupState — the result still
    equals the batch sessionize over the full data."""
    import os

    from wikiextractor_spark.streaming.stream import event_time_micros_expr

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    # split on epoch micros: approxQuantile takes numeric columns only,
    # and the physical ts type varies by data generation (long nanos /
    # timestamp / timestamp_ntz) — normalize via the streaming helper
    us = event_time_micros_expr(ev.schema["ts"].dataType)
    ev = ev.withColumn("_ts_us", us)
    mid = ev.approxQuantile("_ts_us", [0.5], 0.001)[0]
    src = tmp_path / "ev_split"
    src.mkdir()
    ev.filter(F.col("_ts_us") <= mid).drop("_ts_us").coalesce(1).write.parquet(str(src / "a"))
    ev.filter(F.col("_ts_us") > mid).drop("_ts_us").coalesce(1).write.parquet(str(src / "b"))
    files = []
    for part in ("a", "b"):
        inner = [
            f for f in os.listdir(src / part) if f.endswith(".parquet")
        ][0]
        dst = src / f"{part}.parquet"
        os.rename(src / part / inner, dst)
        files.append(dst)
    # the file source processes oldest-modified first: pin mtimes
    os.utime(files[0], (1_000_000_000, 1_000_000_000))
    os.utime(files[1], (1_000_000_100, 1_000_000_100))

    got = _stream_sessions(
        spark, str(src), "sess_split",
        path_glob="*.parquet", max_files_per_trigger=1,
    )
    assert got == _batch_sessions(spark, sf)


def test_sessionize_parquet_sink_matches_batch(spark, tmp_path):
    """The production foreachBatch parquet log, merged on read, must
    equal the batch sessionize — including sessions stitched across a
    forced two-batch split (update rows from both batches land in the
    log; read_sessions keeps the max-marker emit)."""
    import os

    from wikiextractor_spark.streaming import read_sessions, sessionize_to_parquet

    from wikiextractor_spark.streaming.stream import event_time_micros_expr

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    us = event_time_micros_expr(ev.schema["ts"].dataType)
    ev = ev.withColumn("_ts_us", us)
    mid = ev.approxQuantile("_ts_us", [0.5], 0.001)[0]
    src = tmp_path / "ev_split_pq"
    src.mkdir()
    ev.filter(F.col("_ts_us") <= mid).drop("_ts_us").coalesce(1).write.parquet(str(src / "a"))
    ev.filter(F.col("_ts_us") > mid).drop("_ts_us").coalesce(1).write.parquet(str(src / "b"))
    files = []
    for part in ("a", "b"):
        inner = [f for f in os.listdir(src / part) if f.endswith(".parquet")][0]
        dst = src / f"{part}.parquet"
        os.rename(src / part / inner, dst)
        files.append(dst)
    os.utime(files[0], (1_000_000_000, 1_000_000_000))
    os.utime(files[1], (1_000_000_100, 1_000_000_100))

    q = sessionize_to_parquet(
        spark, str(src), str(tmp_path / "sess_log"), str(tmp_path / "sess_ckpt"),
        path_glob="*.parquet", max_files_per_trigger=1,
    )
    assert q.awaitTermination(120)
    merged = {
        (r["user_id"], r["sess_id"]): (r["n_events"], r["duration_s"])
        for r in read_sessions(spark, str(tmp_path / "sess_log")).collect()
    }
    assert merged == _batch_sessions(spark, sf)


def test_sessionize_drops_cross_batch_stragglers(spark, tmp_path):
    """An event arriving in a LATER micro-batch with ts older than the
    group's carried last_ts must not move session time backwards: it
    is dropped and surfaced in n_late (r2 treated it as a continuation,
    corrupting the session)."""
    import os

    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    sec = 1_000_000_000  # events.ts is raw nanos
    batch_a = spark.createDataFrame(
        [(1, 1000 * sec, 7, "view", 1.0, "{}"),
         (2, 1010 * sec, 7, "view", 1.0, "{}")], schema
    )
    batch_b = spark.createDataFrame(
        [(3, 500 * sec, 7, "view", 1.0, "{}"),
         (4, 1020 * sec, 7, "view", 1.0, "{}")], schema
    )
    src = tmp_path / "late_src"
    src.mkdir()
    for name, df in (("a", batch_a), ("b", batch_b)):
        df.coalesce(1).write.parquet(str(src / f"{name}_dir"))
        inner = [f for f in os.listdir(src / f"{name}_dir")
                 if f.endswith(".parquet")][0]
        os.rename(src / f"{name}_dir" / inner, src / f"{name}.parquet")
    os.utime(src / "a.parquet", (1_000_000_000, 1_000_000_000))
    os.utime(src / "b.parquet", (1_000_000_100, 1_000_000_100))

    got = _stream_sessions(
        spark, str(src), "sess_late",
        path_glob="*.parquet", max_files_per_trigger=1,
        gap_s=60, watermark="10 hours",
    )
    # one session: events at 1000/1010/1020s; the 500s straggler gone
    assert got == {(7, 1): (3, 20)}
    late = spark.sql(
        "SELECT sum(n_late) AS n FROM sess_late"
    ).collect()[0]["n"]
    assert late == 1


def test_embedding_neighbor_symmetric_bound(spark):
    df = REGISTRY["dd_embedding_neighbor"][0](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    nn = [r for r in rows if r["family"] == "nn"]
    pairs = [r for r in rows if r["family"] == "pair"]
    assert len(nn) == 100  # one neighbor per vec
    assert len(pairs) == 40 * 39 // 2  # bounded all-pairs family (r7)
    assert all(-1.0 <= r["cos"] <= 1.0 for r in rows)


def test_decontam_report_matches_duckdb_string_grams(spark, sf_dir):
    """The xxhash64-based contamination report must agree doc-by-doc
    with an independent DuckDB implementation that compares the gram
    STRINGS directly (no hashing) — two different representations of
    the same semantics."""
    import duckdb

    from wikiextractor_spark.operators.decontam import contamination_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.orderBy("doc_id").limit(5).select("text")
    rep = contamination_report(docs, bench, n=13, threshold=0.1)
    got = {r.doc_id: (r.n_grams, r.n_hits) for r in rep.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = con.execute(
        """
        WITH norm AS (
          SELECT doc_id, string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' ') ws
          FROM documents),
        grams AS (
          SELECT doc_id,
            CASE WHEN len(ws) < 13 THEN [array_to_string(ws, ' ')]
                 ELSE [array_to_string(ws[i+1:i+13], ' ')
                       for i in range(0, len(ws)-13+1)]
            END gs
          FROM norm),
        bench AS (
          SELECT DISTINCT unnest(gs) g FROM grams
          WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5)),
        exploded AS (SELECT doc_id, len(gs) n_grams, unnest(gs) g FROM grams)
        SELECT doc_id, any_value(n_grams),
               sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END)::BIGINT
        FROM exploded GROUP BY doc_id
        """
    ).fetchall()
    con.close()
    want = {r[0]: (r[1], r[2]) for r in oracle}
    assert got == want


def test_dup_line_fraction_matches_duckdb(spark, sf_dir):
    """Repetition signal vs an independent DuckDB list-expression
    twin on the real documents table."""
    import duckdb

    from wikiextractor_spark.functions.repetition import dup_line_fraction

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.doc_id: r.f
        for r in docs.select("doc_id", dup_line_fraction("text").alias("f")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.execute(
        """
        WITH l AS (
          SELECT doc_id,
                 [x for x in list_transform(string_split(text, chr(10)),
                  y -> trim(y)) if x != ''] ls
          FROM documents)
        SELECT doc_id,
          CASE WHEN len(ls)=0 THEN 0.0
               ELSE (len(ls) - len(list_distinct(ls))) * 1.0 / len(ls) END f
        FROM l
        """
    ).fetchall()
    con.close()
    assert all(abs(f - got[d]) < 1e-9 for d, f in rows)
