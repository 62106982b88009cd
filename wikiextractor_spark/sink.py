"""Record sink (SURVEY.md §2.9).

The reference's intended (per-README) behavior — size-split output
files, optional bz2 — mapped to idiomatic Spark: each document is
assembled into ONE string row (header + newline-joined lines) and
written with ``DataFrameWriter.text``; sizing via
``maxRecordsPerFile`` / repartition; compression via codec option.
Assembling whole records avoids any dependence on row order inside an
output partition (global order is unspecified in the engine contract,
matching the driver's order-insensitive hash).

Reference record format (``WikiExtractor.py:136-143``):
``\\n{title}:{'|||'.join(tags)}\\n`` followed by one compacted line
per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def render_documents(df: DataFrame) -> DataFrame:
    """``(title, tags array<string>, lines array<string>)`` →
    one ``value`` string column per document in reference format."""
    header = F.format_string(
        "\n%s:%s", F.col("title"), F.concat_ws("|||", F.col("tags"))
    )
    body = F.concat_ws("\n", F.col("lines"))
    return df.select(
        F.when(F.size("lines") > 0, F.concat(header, F.lit("\n"), body))
        .otherwise(header)
        .alias("value")
    )


def write_documents(
    df: DataFrame,
    out_dir: str,
    compress: bool = False,
    max_records_per_file: int | None = None,
    num_files: int | None = None,
) -> None:
    """Write rendered records as text; bz2 when ``compress`` (the
    ``--compress`` flag, reference ``WikiExtractor.py:692``)."""
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if num_files:
        df = df.repartition(num_files)
        writer = df.write.mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compress:
        writer = writer.option("compression", "bzip2")
    writer.text(out_dir)


def write_documents_structured(
    docs: DataFrame,
    out_dir: str,
    fmt: str = "parquet",
    partition_by: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Training-pipeline sink: the typed document table (id, url,
    title, tags, cleaned text, lines) as parquet or jsonl — the format
    downstream Spark/DuckDB jobs actually want, vs the reference's
    plain-text record stream.  ``partition_by`` enables partition
    pruning for downstream readers (e.g. by lang at corpus scale)."""
    writer = docs.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "parquet":
        writer.parquet(out_dir)
    elif fmt in ("json", "jsonl"):
        writer.json(out_dir)
    else:
        raise ValueError(f"unsupported sink format: {fmt!r}")
