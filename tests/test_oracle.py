"""Local replica of the driver's correctness gate: every query in
``queries()`` is run on Spark and compared to its DuckDB
``oracle_sql()`` — row count, column names, and order-insensitive
value equality at sf0.01 (override with SPARK_GRAFT_ORACLE_SF_DIR).

FAITHFULNESS MATTERS: round 1 shipped 14 driver failures behind a
green local gate because this file compared ``fetchall()`` tuples
(DuckDB HUGEINT → Python int; lists hashable).  The driver
canonicalizes through *pandas* — ``toPandas()`` / ``.df()``, columns
sorted by name, ``sort_values`` over all columns, dtype-sensitive
stringification — so:

* DuckDB ``SUM(BIGINT)`` → HUGEINT → pandas float64 renders "450.0"
  while Spark int64 renders "450" → hash mismatch;
* ARRAY output columns become ndarray cells and ``sort_values``
  raises ``unhashable type: 'numpy.ndarray'``.

This replica goes through the same pandas path so both classes fail
locally first.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck_con():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    """The driver's canonicalization: columns sorted by name, rows
    sorted by all columns (pandas ``sort_values`` — raises on
    unhashable cells, as the driver does), values stringified
    dtype-sensitively (int64 "450" vs float64 "450.0" DIFFER)."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return [
        tuple(str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    fn = QUERIES[name]
    df = fn(spark, SF_DIR)
    spark_pdf = df.toPandas()

    if name not in ORACLES:
        assert len(spark_pdf) > 0, f"{name}: rows-only check failed (0 rows)"
        # rows-only results still flow through the driver canonicalizer
        _canon(spark_pdf)
        return

    duck_pdf = _duck_con().execute(ORACLES[name]).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs"
        f" {list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a = _canon(spark_pdf)
    b = _canon(duck_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.simpleString()  # stable schema materializes
