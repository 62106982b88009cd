"""Parquet table loaders for the driver's TPC-H-ish test schema
(TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

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
        # Normalize events.ts to TIMESTAMP_NTZ regardless of how the
        # generator wrote it — the physical parquet type has changed
        # across driver rounds, so adapt to what the scan produced:
        #   * LongType: TIMESTAMP(NANOS) parquet read as raw nanos
        #     (spark.sql.legacy.parquet.nanosAsLong, set by tune());
        #     floor-convert to micros — bit-identical to DuckDB's
        #     nanos→micros truncation.
        #   * TimestampType: TIMESTAMP(MICROS/MILLIS) adjusted-to-UTC;
        #     reinterpret as naive (session tz is pinned UTC).
        #   * TimestampNTZType: already canonical, leave untouched.
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn(
                "ts",
                F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"),
            )
        elif isinstance(ts_type, TimestampType):
            df = df.withColumn("ts", F.col("ts").cast(TimestampNTZType()))
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
