"""Leakage-safe split assignment (operators/sampling.py
assign_splits): determinism, group cohesion (the leakage property),
fraction realization, NULL-key fate, and contract errors."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.operators.sampling import (
    _BUCKETS,
    assign_splits,
)

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _py_bucket(key, salt):
    s = ("<null>" if key is None else str(key)) + salt
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % _BUCKETS


def _py_split(key, fractions, salt="split"):
    b = _py_bucket(key, salt)
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        if b < int(round(cum * _BUCKETS)):
            return name
    return names[-1]


def test_matches_reference_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, i % 97) for i in range(2000)], "doc_id long, cluster long"
    )
    got = {
        r["doc_id"]: r["split"]
        for r in assign_splits(df, FR, key_col="cluster").collect()
    }
    for i in range(2000):
        assert got[i] == _py_split(i % 97, FR), i
    # repartitioning cannot change the assignment (pure function)
    got2 = {
        r["doc_id"]: r["split"]
        for r in assign_splits(
            df.repartition(13), FR, key_col="cluster"
        ).collect()
    }
    assert got == got2


def test_leakage_property_group_cohesion(spark):
    """All rows sharing the key land in one split — near-dup cluster
    members can never straddle train and eval."""
    df = spark.createDataFrame(
        [(i, i % 50) for i in range(1500)], "doc_id long, cluster long"
    )
    per_cluster = (
        assign_splits(df, FR, key_col="cluster")
        .groupBy("cluster")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_cluster)


def test_fractions_realized_and_exhaustive(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(20000)], "doc_id long"
    )
    counts = {
        r["split"]: r["c"]
        for r in assign_splits(df, FR)
        .groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert sum(counts.values()) == 20000  # exhaustive, nothing dropped
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01


def test_null_key_deterministic_fate(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, cluster string"
    )
    rows = assign_splits(df, FR, key_col="cluster").collect()
    splits = {r["split"] for r in rows}
    assert len(splits) == 1  # both NULL keys share one fate
    assert splits.pop() == _py_split(None, FR)


def test_single_split_and_salt_independence(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    rows = assign_splits(df, {"all": 1.0}).collect()
    assert all(r["split"] == "all" for r in rows)
    a = {r["doc_id"]: r["split"]
         for r in assign_splits(df, FR, salt="a").collect()}
    b = {r["doc_id"]: r["split"]
         for r in assign_splits(df, FR, salt="b").collect()}
    assert a != b  # different salt, different (still valid) assignment


def test_contract_errors(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="sum to"):
        assign_splits(df, {"train": 0.8, "val": 0.1})
    with pytest.raises(ValueError, match="positive"):
        assign_splits(df, {"train": 1.2, "val": -0.2})
    with pytest.raises(ValueError, match="at least one"):
        assign_splits(df, {})
    with pytest.raises(ValueError, match="empty or not strings"):
        assign_splits(df, {"": 1.0})


def test_composes_with_near_dup_clusters(spark):
    """The intended composition: connected-component labels from
    near-dup pair detection as the split key — members of a dup
    component land in the same split, singletons key on themselves."""
    from wikiextractor_spark.operators.dedup import (
        connected_component_labels,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (3, 6)], "id_a long, id_b long"
    )
    labels = connected_component_labels(pairs)
    keyed = docs.join(
        labels.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("label"), F.col("doc_id"))
    )
    by_id = {
        r["doc_id"]: r["split"]
        for r in assign_splits(keyed, FR, key_col="cluster_id").collect()
    }
    assert by_id[1] == by_id[2] == by_id[5]
    assert by_id[3] == by_id[6]
