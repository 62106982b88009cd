"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship wiki-extraction + text-analysis
pipeline at sf0.001; ``queries()``/``oracle_sql()`` expose the full
operator battery from ``wikiextractor_spark.queries`` (one entry per
implemented SURVEY.md §2 inventory row + the LLM-pipeline extension
operators), checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: wrap each document in
    wiki markup, run fidelity clean + compact + text analytics — the
    whole engine in one narrow, shuffle-free plan."""
    from wikiextractor_spark.functions import textstats
    from wikiextractor_spark.session import tune
    from wikiextractor_spark.sources.tables import load_table
    from wikiextractor_spark.udfs import clean_wikitext_udf, compact_lines_udf

    tune(spark)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # NB no space after the template: template removal would leave a
    # leading space and the (bug-compatible) preformatted rule C20
    # would then drop the whole first line.
    wikitext = F.concat(
        F.lit("{{infobox|x}}'''"),
        F.col("text"),
        F.lit("''' has [[markup|links]]s &amp;nbsp; <!--c-->\n== Sec ==\nBody of "),
        F.col("source"),
        F.lit("."),
    )
    return (
        docs.withColumn("cleaned", clean_wikitext_udf(wikitext))
        .withColumn("lines", compact_lines_udf(F.col("cleaned")))
        .select(
            "doc_id",
            "lang",
            F.size("lines").alias("n_lines"),
            textstats.token_count(F.col("cleaned")).alias("n_tokens"),
            textstats.lang_id("cleaned").alias("lang_pred"),
            textstats.fingerprint(F.col("cleaned")).alias("fp"),
            F.concat_ws("\n", "lines").alias("doc_text"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    dedup / similarity / text-analysis / multimodal extensions."""
    from wikiextractor_spark.queries import REGISTRY

    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each query — since round 3 every battery
    entry carries one (genuinely non-SQL-expressible ops would be
    omitted → rows-only check; none currently are)."""
    from wikiextractor_spark.queries import REGISTRY

    return {
        name: oracle
        for name, (_fn, oracle) in REGISTRY.items()
        if oracle is not None
    }
