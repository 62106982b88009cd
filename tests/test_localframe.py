"""local_rows_df must be VALUE-IDENTICAL to the classic
createDataFrame path (the r17 LocalRelation constructor's whole
contract), and the driver-side whole-text artifact read must keep the
RDD route's transparent compression decoding."""

from __future__ import annotations

import gzip
import math

import pytest

from wikiextractor_spark.localframe import local_rows_df


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()


def test_clean_rows_plan_as_local_relation(spark):
    df = local_rows_df(
        spark,
        [("▁the", -4.25), (None, -10.0), ("<0xFF>", -0.5)],
        "token string, logprob double",
    )
    assert _plan(df) == "LocalRelation"
    got = {(r["token"], r["logprob"]) for r in df.collect()}
    assert got == {("▁the", -4.25), (None, -10.0), ("<0xFF>", -0.5)}


def test_big_ints_and_nulls_exact(spark):
    df = local_rows_df(spark, [(1, 2**62), (2, None)], "a long, b long")
    assert sorted(tuple(r) for r in df.collect()) == [
        (1, 2**62),
        (2, None),
    ]
    assert _plan(df) == "LocalRelation"


def test_nan_falls_back_and_survives_top_level(spark):
    nan = float("nan")
    df = local_rows_df(spark, [("x", nan)], "t string, v double")
    (row,) = df.collect()
    assert math.isnan(row["v"])  # Arrow would have folded it to NULL


def test_nan_falls_back_and_survives_nested(spark):
    nan = float("nan")
    df = local_rows_df(
        spark, [(1, [1.0, nan])], "q_id long, v array<double>"
    )
    (row,) = df.collect()
    assert math.isnan(row["v"][1])


def test_type_mismatch_raises_like_classic(spark):
    # the Arrow path would silently truncate 2.9 -> 2 under bigint;
    # the constructor must keep the classic path's loud TypeError
    with pytest.raises(Exception):
        local_rows_df(spark, [(2.9,)], "a bigint").collect()


def test_whole_text_artifact_decodes_compressed(spark, tmp_path):
    from wikiextractor_spark.functions.tokenizer import (
        _whole_text_artifact,
    )

    text = "héllo ▁merge\n"
    with gzip.open(tmp_path / "m.txt.gz", "wb") as f:
        f.write(text.encode("utf-8"))
    assert _whole_text_artifact(spark, str(tmp_path / "m.txt.gz"), "t") == text
    (tmp_path / "m.txt").write_text("plain ok\n")
    assert _whole_text_artifact(spark, str(tmp_path / "m.txt"), "t") == "plain ok\n"
    with pytest.raises(ValueError, match="found 0"):
        _whole_text_artifact(spark, str(tmp_path / "missing.txt"), "t")
