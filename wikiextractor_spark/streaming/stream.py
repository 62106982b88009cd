"""Structured Streaming wrappers (SURVEY.md §2.10).

The reference is strictly batch, but every cleaning operator is
stateless per row, so the same expressions lift onto ``readStream``
for free: continuous ingestion of dump/document directories.  The
event-window aggregation shows the stateful side: watermarked
tumbling windows over the ``events`` stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wikiextractor_spark.functions.cleaning import clean_markup_native

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

# The physical parquet type of events.ts has varied across data
# generations (TIMESTAMP(NANOS) read as raw int64 nanos under
# nanosAsLong; naive TIMESTAMP(MICROS) read as TIMESTAMP_NTZ;
# adjusted-to-UTC TIMESTAMP read as TIMESTAMP).  The streaming file
# source needs the schema up front, so the readers below probe one
# batch footer (cheap: metadata only, no row I/O) and adapt — the same
# normalization the batch loader does in sources/tables.py.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_ts_type(spark: SparkSession, input_dir: str, path_glob: str | None):
    """Footer-probe the physical type of ``ts`` in the events parquet
    under ``input_dir`` (batch read = one footer fetch, no data scan).

    A live tail may start on a directory that EXISTS but has no
    matching files yet — only then does the probe fall back to
    TIMESTAMP_NTZ (the canonical type every batch loader normalizes
    to, and what current generators write), so the stream still starts
    and picks files up as they arrive.  A nonexistent path or a
    corrupt/foreign file still fails fast at start — swallowing those
    would turn a typo'd input_dir into a silently idle stream."""
    from pyspark.sql.types import TimestampNTZType

    from wikiextractor_spark.fsutil import hadoop_fs

    jpath, fs = hadoop_fs(spark, input_dir)
    if not fs.exists(jpath):
        raise FileNotFoundError(
            f"events stream input directory does not exist: {input_dir}"
        )
    jvm = spark._jvm
    pattern = f"{input_dir.rstrip('/')}/{path_glob or '*'}"
    statuses = fs.globStatus(jvm.org.apache.hadoop.fs.Path(pattern)) or []
    has_files = any(not st.isDirectory() for st in statuses)
    has_dirs = any(st.isDirectory() for st in statuses)
    if not has_files and not has_dirs:
        return TimestampNTZType()  # empty so far: canonical fallback
    reader = spark.read
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    try:
        return reader.parquet(input_dir).schema["ts"].dataType
    except Exception:
        if has_files:
            raise  # real files that cannot be read: fail fast
        return TimestampNTZType()  # only empty subdirectories so far


def events_schema_for(ts_type) -> StructType:
    """EVENTS_SCHEMA with ``ts`` declared as the probed physical type."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def event_time_expr(ts_type):
    """Normalize raw ``ts`` → TimestampType event time.  Raw int64 is
    nanos (floor-divide to micros, matching DuckDB's nanos→micros
    truncation); timestamp flavors cast directly (session tz is pinned
    UTC, so NTZ→LTZ preserves the wall clock)."""
    if isinstance(ts_type, LongType):
        return F.timestamp_micros(F.expr("ts DIV 1000"))
    return F.col("ts").cast(TimestampType())


def event_time_micros_expr(ts_type):
    """Same normalization, as raw epoch micros (LongType)."""
    if isinstance(ts_type, LongType):
        return F.expr("ts DIV 1000")
    return F.unix_micros(F.col("ts").cast(TimestampType()))


def clean_documents_stream(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str,
):
    """File-source stream of document parquet → the SAME native clean
    chain used in batch → parquet sink.  ``availableNow`` processes the
    backlog then stops (the batch-parity trigger; drop it for a live
    tail)."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .parquet(input_dir)
        .withColumn("cleaned", clean_markup_native(F.col("text")))
        .select("doc_id", "lang", "cleaned")
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_stream(
    spark: SparkSession, input_dir: str, window: str = "1 hour",
    watermark: str = "2 hours", path_glob: str | None = None,
) -> DataFrame:
    """The watermarked tumbling-window aggregation as a streaming
    DataFrame: counts + value sum per (window, event_type) over a
    streamed events directory.  Late rows beyond the watermark are
    dropped — the streaming-correctness contract."""
    ts_type = events_ts_type(spark, input_dir, path_glob)
    reader = spark.readStream.schema(events_schema_for(ts_type))
    if path_glob:
        # the streaming file source only accepts directories; the glob
        # narrows to the events file inside a mixed-table directory
        reader = reader.option("pathGlobFilter", path_glob)
    return (
        reader.parquet(input_dir)
        .withColumn("ts", event_time_expr(ts_type))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            # integerize per row BEFORE summing (the battery's money
            # rule): the sum is exact in integer domain, so the value
            # is independent of aggregation order — oracle-portable,
            # unlike a float sum whose low bits depend on partitioning
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias(
                "value_cents"
            ),
        )
    )


def windowed_event_counts(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str,
    window: str = "1 hour", watermark: str = "2 hours",
    path_glob: str | None = None,
):
    """Watermarked windowed counts → parquet file sink, append mode:
    executors write finalized windows directly; NO aggregate state ever
    lands on the driver (the r1 memory/`complete` sink kept the whole
    result table driver-side — fine as a test harness, a scale-killer
    at 100 TB).  Append emits a window only once its end passes the
    watermark, so the trailing <watermark+window> of event time stays
    open — exactly the semantics a production stream has.

    ``availableNow`` drains the backlog; Spark's closing no-data
    micro-batch then flushes every window older than the final
    watermark to the sink."""
    stream = windowed_event_stream(spark, input_dir, window, watermark, path_glob)
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts_memory(
    spark: SparkSession, input_dir: str, window: str = "1 hour",
    watermark: str = "2 hours", query_name: str = "event_counts",
    path_glob: str | None = None,
):
    """TEST-HARNESS-ONLY variant: memory sink + complete mode holds
    the whole result table on the driver.  Used by pytest to pin
    batch parity on bounded inputs; never in the battery or at scale
    (use :func:`windowed_event_counts`)."""
    stream = windowed_event_stream(spark, input_dir, window, watermark, path_glob)
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
