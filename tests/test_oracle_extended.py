"""Extra semantic pins beyond the generic oracle compare."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikiextractor_spark.queries import REGISTRY


def test_stream_matches_batch_rollup(spark):
    """The streaming hourly rollup (availableNow) must equal the batch
    ev_hourly_rollup on counts (streaming is the same expressions
    lifted onto readStream)."""
    sf = "/root/testdata/sf0.001"
    stream = REGISTRY["st_stream_hourly"][0](spark, sf)
    batch = REGISTRY["ev_hourly_rollup"][0](spark, sf)
    s = {(r["hour_s"], r["event_type"]): r["n_events"] for r in stream.collect()}
    b = {(r["hour_s"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert s == b


def test_rollup_has_grand_total(spark):
    df = REGISTRY["rel_rollup"][0](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    assert len(grand) == 1
    assert grand[0]["n"] == sum(
        r["n"] for r in rows if r["l_returnflag"] is not None and r["l_linestatus"] is not None
    )


def test_embedding_neighbor_symmetric_bound(spark):
    df = REGISTRY["dd_embedding_neighbor"][0](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 100  # one neighbor per vec
    assert all(-1.0 <= r["cos"] <= 1.0 for r in rows)
