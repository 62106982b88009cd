"""Three-way parity for the speed-mode cleaning chain:

Spark Column chain == Python re twin == DuckDB SQL oracle,
on markup fixtures and on real sf0.001 documents (with synthesized
markup wrapped around them).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.functions.cleaning import (
    clean_markup_duckdb_sql,
    clean_markup_native,
    clean_markup_python,
)

FIXTURES = [
    "plain text",
    "residual [[a|b|c]] link",
    "ext [http://e.com anchor] and bare [http&]",
    "'''''bi''''' '''b''' ''\"iq\"'' ''i'' \"\"qq\"\" ''' ''",
    "a <!-- c --> b <br/> <ref x/> <b>k</b> </div> <a href=x>l</a>",
    "tbl <table>x</table> <ul><li>i</li></ul> <ref>r</ref>",
    "guillemets <<q>> end",
    "pre\n formatted\nnormal\ttab  spaces dots.....",
    "punct\n!!!\nline ,, x,. y __NOTOC__",
    "seq ,:.)]Â» and [(Â« here",
]


@pytest.mark.parametrize("text", FIXTURES)
def test_python_twin_vs_duckdb(text):
    sql = "SELECT %s AS c" % clean_markup_duckdb_sql("?::VARCHAR")
    # duckdb param binding inside nested expr: use a VALUES table
    got = duckdb.execute(
        "SELECT %s AS c FROM (SELECT ? AS t)" % clean_markup_duckdb_sql("t"),
        [text],
    ).fetchone()[0]
    assert got == clean_markup_python(text)


def test_spark_chain_three_way(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(FIXTURES)], "id long, t string")
    rows = df.select("id", clean_markup_native(F.col("t")).alias("c")).collect()
    spark_out = {r["id"]: r["c"] for r in rows}
    for i, t in enumerate(FIXTURES):
        assert spark_out[i] == clean_markup_python(t), f"fixture {i}: {t!r}"


def test_spark_vs_duckdb_on_documents(spark, sf_dir):
    """The driver-oracle shape: same expression both engines over the
    real documents table, wrapped in synthesized markup so the steps
    actually fire."""
    wrap_spark = F.concat(
        F.lit("<b>x</b> [[l|"), F.col("text"), F.lit("]] <!--c--> '''b''' .....")
    )
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", clean_markup_native(wrap_spark).alias("cleaned"))
    )
    spark_rows = {r["doc_id"]: r["cleaned"] for r in df.collect()}

    wrap_sql = "'<b>x</b> [[l|' || text || ']] <!--c--> ''''''b'''''' .....'"
    # NB: '''b''' inside a SQL string literal needs each ' doubled
    duck = duckdb.execute(
        "SELECT doc_id, %s AS cleaned FROM '%s/documents.parquet'"
        % (clean_markup_duckdb_sql(wrap_sql), sf_dir)
    ).fetchall()
    assert len(duck) == len(spark_rows)
    for doc_id, cleaned in duck:
        assert spark_rows[doc_id] == cleaned, f"doc {doc_id}"


def test_udfs_round_trip(spark):
    from wikiextractor_spark.udfs import (
        clean_wikitext_udf,
        compact_lines_udf,
        drop_templates_udf,
        expand_wikilinks_udf,
        unescape_entities_udf,
    )
    from wikiextractor_spark import textops

    data = [
        (0, "a {{t{{u}}}} b [[x|y]]s &amp;nbsp; more"),
        (1, "== H ==\nbody line\n* item\nlast"),
        (2, None),
    ]
    df = spark.createDataFrame(data, "id long, t string")
    out = df.select(
        "id",
        drop_templates_udf("t").alias("nested"),
        expand_wikilinks_udf("t").alias("links"),
        unescape_entities_udf("t").alias("unesc"),
        clean_wikitext_udf("t").alias("clean"),
        compact_lines_udf("t").alias("lines"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    for i, t in data:
        if t is None:
            assert by_id[i]["clean"] is None and by_id[i]["lines"] is None
            continue
        assert by_id[i]["nested"] == textops.drop_nested(t, r"{{", r"}}")
        assert by_id[i]["links"] == textops.expand_wikilinks(t)
        assert by_id[i]["unesc"] == textops.unescape_entities(t)
        assert by_id[i]["clean"] == textops.clean_wikitext(t)
        assert by_id[i]["lines"] == textops.compact_lines(t, False)


@pytest.mark.parametrize("seed", range(3))
def test_python_twin_vs_duckdb_fuzz(seed):
    """Randomized markup soup through the Python-re twin and the
    DuckDB(RE2) oracle — pins pattern-semantics agreement beyond the
    fixture set (the Spark/Java side is pinned by the fixture and
    document-level tests above)."""
    import random

    rng = random.Random(42 + seed)
    alphabet = "abcdefgh '\"[]<>!?().,-=*:;&# \n{}|"
    sql = "SELECT %s AS c FROM (SELECT ? AS t)" % clean_markup_duckdb_sql("t")
    for _ in range(120):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 160)))
        got = duckdb.execute(sql, [text]).fetchone()[0]
        assert got == clean_markup_python(text), repr(text)
