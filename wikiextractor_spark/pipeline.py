"""End-to-end extraction pipeline — the whole reference program as one
narrow, shuffle-free DataFrame plan (SURVEY.md §3.3):

    xml scan → native filters (P1-P4) → [vital broadcast joins] →
    clean UDF → compact UDF → render → write.text

No shuffle anywhere (the only wide op would be an optional output
repartition), so throughput scales linearly with input splits at any
data size — the property that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from wikiextractor_spark.config import ExtractorConfig
from wikiextractor_spark.operators.skew import (
    packed_file_splits,
    spread_for_compute,
)
from wikiextractor_spark.sink import render_documents, write_documents
from wikiextractor_spark.sources.dump import (
    discover_base_prefix,
    filter_pages,
    read_pages,
)
from wikiextractor_spark.sources.vital import apply_vital_filter, read_vital_titles
from wikiextractor_spark.udfs import make_clean_udf, make_compact_udf


def extract_documents(
    spark: SparkSession,
    dump_path: str,
    cfg: ExtractorConfig = ExtractorConfig(),
    vital_path: str | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Dump → cleaned documents:
    ``(page_id, url, title, tags, cleaned, lines)``.

    ``min_parallelism`` (default: the cluster's defaultParallelism):
    when the scan produces fewer splits — a single uncompressed XML
    file is NOT splittable by the XML source (verified) — the pages
    are repartitioned once before the UDF stage, trading one cheap
    raw-text shuffle for N× parallel Arrow workers.  On real
    many-file/bz2 inputs the scan already has enough splits and this
    is a no-op.
    """
    prefix = discover_base_prefix(spark, dump_path)
    pages = filter_pages(read_pages(spark, dump_path), cfg)

    if min_parallelism is None:
        min_parallelism = spark.sparkContext.defaultParallelism
    if min_parallelism > 1:
        # scan-parallelism estimate for the one-split-per-file XML
        # source: min(file count, Spark's small-file bin-packing
        # estimate) — file count alone would overstate parallelism on
        # many-small-file dumps (Spark packs them into shared
        # partitions) and a pure size estimate would overstate it on
        # a big single-file dump (the XML reader cannot split one).
        # The probe never touches df.rdd (which would compile a
        # physical plan outside AQE, see skew.py).
        splits = packed_file_splits(pages)
        if splits is not None:
            pages = spread_for_compute(
                pages, min_parallelism, assume_splits=splits
            )

    vital = read_vital_titles(spark, vital_path) if vital_path else None
    pages = apply_vital_filter(pages, vital)

    clean_udf = make_clean_udf(cfg)
    compact_udf = make_compact_udf(cfg.keep_sections)

    return (
        pages.withColumn("cleaned", clean_udf(F.col("text")))
        .withColumn("lines", compact_udf(F.col("cleaned")))
        .withColumn(
            "url",
            F.format_string("%s?curid=%s", F.lit(prefix or ""), F.col("page_id")),
        )
        .select("page_id", "url", "title", "tags", "cleaned", "lines")
    )


def extract_to_text(
    spark: SparkSession,
    dump_path: str,
    out_dir: str,
    cfg: ExtractorConfig = ExtractorConfig(),
    vital_path: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """The reference CLI, end to end: write cleaned documents in the
    reference's record format to ``out_dir``."""
    docs = extract_documents(spark, dump_path, cfg, vital_path)
    write_documents(
        render_documents(docs),
        out_dir,
        compress=cfg.compress,
        max_records_per_file=max_records_per_file,
    )


def exploded_lines(docs: DataFrame) -> DataFrame:
    """Line-grain view: one row per output line with its position —
    the engine's explode of the reference's per-line prints."""
    return docs.select(
        "page_id",
        "title",
        F.posexplode("lines").alias("line_no", "line"),
    )
