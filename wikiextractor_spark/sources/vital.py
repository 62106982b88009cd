"""Vital-titles side input (SURVEY.md §2.1 S8, §2.7 J1/J2).

File format: one record per line, ``title|||tag1|||tag2`` (reference
``WikiExtractor.py:653-667``, the commented-out loader).  Loaded as a
small dimension DataFrame for broadcast joins — the distributed form
of the reference's in-memory set/dict probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_vital_titles(spark: SparkSession, path: str) -> DataFrame:
    """→ ``(title string, tags array<string>)``."""
    split = F.split(F.col("value"), r"\|\|\|")
    return (
        spark.read.text(path)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.trim(split[0]).alias("title"),
            F.slice(split, 2, 2147483647 - 1).alias("tags"),
        )
    )


def apply_vital_filter(pages: DataFrame, vital: DataFrame | None) -> DataFrame:
    """P3 + J2: keep only vital titles AND attach their tags in ONE
    broadcast inner join (membership filter + tag lookup are the same
    probe — r1 shipped a redundant left-semi before the left join, one
    extra broadcast probe per row at scale).  ``vital=None`` ⇒ keep all
    with empty tags — the reference's "no file ⇒ keep everything" rule
    (``WikiExtractor.py:630, 634``)."""
    if vital is None:
        return pages.withColumn("tags", F.array().cast("array<string>"))
    tagged = F.broadcast(vital.select("title", "tags"))
    return pages.join(tagged, "title", "inner").withColumn(
        "tags", F.coalesce(F.col("tags"), F.array().cast("array<string>"))
    )
