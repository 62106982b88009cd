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
    stream = REGISTRY["st_stream_hourly"][0](spark, sf)
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


def test_embedding_neighbor_symmetric_bound(spark):
    df = REGISTRY["dd_embedding_neighbor"][0](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 100  # one neighbor per vec
    assert all(-1.0 <= r["cos"] <= 1.0 for r in rows)
