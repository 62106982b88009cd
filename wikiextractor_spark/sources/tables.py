"""Parquet table loaders for the driver's TPC-H-ish test schema
(TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from wikiextractor_spark.session import tune

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # tune() BEFORE any read: a fresh driver session rejects the
    # events table's TIMESTAMP(NANOS) parquet unless nanosAsLong is
    # set, and query execution order is not ours to choose
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): read as raw nanos
        # (spark.sql.legacy.parquet.nanosAsLong, set by tune()) and
        # floor-convert to micros as TIMESTAMP_NTZ — bit-identical to
        # DuckDB's nanos→micros truncation, naive like the other
        # tables' timestamp_ntz columns.
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"),
        )
    return df


# (session id, sf_dir) → loaded tables; avoids re-reading 10 parquet
# footers on every query call in the same session (the battery runs
# 50+ queries back to back).
_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    tune(spark)
    tables = {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
    _CACHE[key] = tables
    return tables


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
