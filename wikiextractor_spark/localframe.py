"""Driver-local DataFrame construction that plans as a LocalRelation.

``spark.createDataFrame(list_of_tuples, schema)`` builds an
RDD-backed frame (``LogicalRDD``): every downstream ``collect()`` —
and the engine's artifact frames are collected once per kernel bind —
launches a full Spark job (measured ~0.3s at local[32] for a 24-row
table, pure scheduling latency).  The pandas/Arrow construction path
produces a ``LocalRelation`` literal instead, whose ``collect()`` is
driver-side and job-free (~0.02s), and which the planner can fold
like any literal table.

Values are identical BY CONSTRUCTION, not by hope: the Arrow path has
two coercions the classic path does not — it folds float NaN into
NULL (at any nesting depth), and it silently casts mismatched
numerics (``2.9`` under a ``bigint`` field truncates to ``2`` where
``createDataFrame`` raises).  ``local_rows_df`` therefore routes any
row set carrying a NaN, or any value whose Python type does not match
its declared field class, through the classic path — which preserves
the pre-existing value/raise behavior exactly.  Use for DRIVER-SIZED
artifact and config frames only — the rows live in driver memory
either way, this just stops tiny tables from costing cluster round
trips.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _arrow_safe_value(v, dt) -> bool:
    """True when the Arrow conversion of ``v`` under field type ``dt``
    is value-identical to the classic path: no NaN anywhere (Arrow
    folds NaN → NULL), integral fields hold real ints (Arrow would
    silently truncate floats where the classic path raises), string
    fields hold str, and containers are checked recursively."""
    from pyspark.sql.types import (
        ArrayType,
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        StructType,
    )

    if v is None:
        return True
    if isinstance(v, float) and math.isnan(v):
        return False
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return isinstance(v, int) and not isinstance(v, bool)
    if isinstance(dt, StringType):
        return isinstance(v, str)
    if isinstance(dt, ArrayType):
        if not isinstance(v, (list, tuple)):
            return False
        return all(_arrow_safe_value(x, dt.elementType) for x in v)
    if isinstance(dt, StructType):
        if not isinstance(v, (list, tuple)) or len(v) != len(dt.fields):
            return False
        return all(
            _arrow_safe_value(x, f.dataType)
            for x, f in zip(v, dt.fields)
        )
    # floats/doubles/bools/etc.: NaN was excluded above; remaining
    # coercions (int under double, ...) match the classic path
    return True


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``rows`` (list of tuples) under ``schema`` (DDL string or
    StructType) as a LocalRelation-backed DataFrame; falls back to the
    plain ``createDataFrame`` path whenever the Arrow conversion could
    differ from it (NaN anywhere, type-mismatched values, empty input,
    conversion errors) — never silently different."""
    from pyspark.sql.types import StructType

    rows = list(rows)
    st = (
        schema if isinstance(schema, StructType)
        else StructType.fromDDL(schema)
    )
    safe = bool(rows) and all(
        len(r) == len(st.fields)
        and all(
            _arrow_safe_value(v, f.dataType)
            for v, f in zip(r, st.fields)
        )
        for r in rows
    )
    if safe:
        try:
            import pandas as pd

            pdf = pd.DataFrame(
                {i: pd.Series([r[i] for r in rows], dtype="object")
                 for i in range(len(st.fields))}
            )
            pdf.columns = st.names
            return spark.createDataFrame(pdf, st)
        except Exception:
            pass  # fall through to the classic path
    return spark.createDataFrame(rows, schema)
