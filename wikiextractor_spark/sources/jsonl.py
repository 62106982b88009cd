"""JSONL document source — the interchange format training pipelines
actually ship (one JSON object per line, splittable, appendable).

Spark's native json reader does the heavy lifting (splittable scan,
schema enforcement, whole-stage-codegen parsing); this module pins the
two decisions that matter at 100 TB:

* **Explicit schema, never inference.**  Schema inference is a full
  extra pass over the data before the real read — at corpus scale
  that doubles the scan.  The documents schema is declared once here.
* **Corrupt records are data, not crashes.**  A 100 TB crawl WILL
  contain truncated lines and invalid JSON.  PERMISSIVE mode lands
  every unparseable line in ``_corrupt_record`` so the pipeline can
  count, sample, and quarantine them (``split_corrupt``) instead of
  dying mid-job (FAILFAST) or silently dropping data (DROPMALFORMED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from wikiextractor_spark.session import tune

# documents-table schema (TESTDATA.md) + the PERMISSIVE capture column
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: StructType | None = None,
) -> DataFrame:
    """Splittable scan of JSONL documents with explicit schema and
    corrupt-record capture.  ``path`` accepts files, directories, and
    globs — the multi-file layout is the scale path (one task per
    split)."""
    tune(spark)
    return (
        spark.read.schema(schema or DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ ``(good, quarantine)``: parsed rows without the capture
    column, and the raw text of every line that failed to parse.
    Spark requires the corrupt-column filter to run on a materialized
    frame (filtering a pure scan on ``_corrupt_record`` is rejected),
    hence the cache — the scan is shared by both sides, paid once."""
    df = df.cache()
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine
