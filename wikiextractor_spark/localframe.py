"""Driver-local DataFrame construction that plans as a LocalRelation.

``spark.createDataFrame(list_of_tuples, schema)`` builds an
RDD-backed frame (``LogicalRDD``): every downstream ``collect()`` —
and the engine's artifact frames are collected once per kernel bind —
launches a full Spark job (measured ~0.3s at local[32] for a 24-row
table, pure scheduling latency).  The pandas/Arrow construction path
produces a ``LocalRelation`` literal instead, whose ``collect()`` is
driver-side and job-free (~0.02s), and which the planner can fold
like any literal table.

Values are identical: rows are carried in object-dtype pandas columns
(no numpy coercion — big ints stay exact, None stays NULL, NaN stays
NaN) and cast by Arrow under the caller's explicit schema, the same
types the RDD path would produce.  Use for DRIVER-SIZED artifact and
config frames only — the rows live in driver memory either way, this
just stops tiny tables from costing cluster round trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``rows`` (list of tuples) under ``schema`` (DDL string or
    StructType) as a LocalRelation-backed DataFrame; falls back to the
    plain ``createDataFrame`` path when the Arrow conversion cannot
    express the data (never silently different — both paths apply the
    same explicit schema)."""
    import math

    rows = list(rows)

    def _has_nan(v) -> bool:
        return isinstance(v, float) and math.isnan(v)

    # Arrow's object-column conversion folds float NaN into NULL; the
    # classic path keeps it a double NaN.  NaN-carrying artifact rows
    # exist only on deliberate corrupt-artifact (raise) paths — route
    # them through the classic path so validation sees the same value.
    if rows and not any(any(_has_nan(v) for v in r) for r in rows):
        try:
            import pandas as pd

            ncols = len(rows[0])
            pdf = pd.DataFrame(
                {i: pd.Series([r[i] for r in rows], dtype="object")
                 for i in range(ncols)}
            )
            from pyspark.sql.types import StructType

            st = (
                schema if isinstance(schema, StructType)
                else StructType.fromDDL(schema)
            )
            pdf.columns = st.names
            return spark.createDataFrame(pdf, st)
        except Exception:
            pass  # fall through to the classic path
    return spark.createDataFrame(rows, schema)
