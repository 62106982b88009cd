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


def write_sized_parquet(
    df: DataFrame,
    out_dir: str,
    *,
    target_file_mb: int = 256,
    row_group_mb: int = 32,
    sort_by: str | None = None,
    sample_fraction: float = 0.02,
) -> int:
    """Scale-layout parquet writer: size-targeted files with bounded
    row groups and optional range clustering.  Returns the file count.

    Why this exists: scan parallelism is capped by ROW-GROUP count,
    not file count — parquet can't split below a row group, so one
    600k-row single-row-group file scans on one task no matter what
    ``maxPartitionBytes`` says (see PERF.md).  A 100 TB corpus must be
    written with deliberate layout or every downstream job inherits
    the skew:

    * file sizing: rows are counted once, then per-row on-disk bytes
      are MEASURED by writing a ≤10k-row sample as parquet and sizing
      it — a format-exact estimate (JSON-length heuristics are off
      3-5× on numeric tables because parquet's dictionary/RLE encoding
      is column-shaped, measured in PERF.md);
    * ``parquet.block.size`` bounds row groups to ``row_group_mb`` so
      even a file that lands oversized stays multi-task;
    * ``sort_by`` switches repartition → ``repartitionByRange`` +
      ``sortWithinPartitions``: each file covers a narrow key range,
      so file/row-group min-max stats let downstream range predicates
      prune entire files (poor man's clustering index).

    The persist is load-bearing: count + sample + write would
    otherwise recompute the full upstream plan three times.
    """
    if target_file_mb <= 0 or row_group_mb <= 0:
        raise ValueError("target_file_mb and row_group_mb must be positive")
    import glob
    import os
    import shutil
    import tempfile

    df = df.persist()
    try:
        n_rows = df.count()
        if n_rows == 0:
            n_files = 1
        else:
            sample = df.sample(False, min(1.0, sample_fraction), seed=7).limit(10_000)
            sample = sample.persist()
            k = sample.count()
            if k == 0:
                # release the empty sample BEFORE rebinding, or its
                # cached blocks outlive the function (r3 ADVICE)
                sample.unpersist()
                sample = df.limit(min(n_rows, 10_000)).persist()
                k = sample.count()
            tmp = tempfile.mkdtemp(prefix="sizing_sample_")
            try:
                sample.coalesce(1).write.mode("overwrite").parquet(tmp)
                sample_bytes = sum(
                    os.path.getsize(f) for f in glob.glob(f"{tmp}/*.parquet")
                )
            finally:
                sample.unpersist()
                shutil.rmtree(tmp, ignore_errors=True)
            disk_bytes = n_rows * (sample_bytes / max(k, 1))
            n_files = max(1, int(disk_bytes // (target_file_mb * 1024 * 1024)) + 1)
        if sort_by is not None:
            out = df.repartitionByRange(n_files, F.col(sort_by)).sortWithinPartitions(sort_by)
        else:
            out = df.repartition(n_files)
        (
            out.write.mode("overwrite")
            .option("parquet.block.size", row_group_mb * 1024 * 1024)
            .parquet(out_dir)
        )
        return n_files
    finally:
        df.unpersist()
