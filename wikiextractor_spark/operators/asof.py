"""As-of join: for each left row, attach the most recent right row
(same key) whose timestamp is <= the left timestamp.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do).  The naive
translation — an inequality join ``l.key = r.key AND r.ts <= l.ts``
plus a max-per-group — plans as a per-key pair explosion (every left
row × every earlier right row), quadratic per key.  This operator
instead uses the union + running-``last()`` composition:

1. union both sides into one stream, right rows carrying their
   payload in a struct, left rows carrying NULL;
2. one window per key ordered by (ts, side-marker): a running
   ``last(payload, ignorenulls=True)`` gives every row the latest
   right payload at-or-before its timestamp;
3. keep only left rows.

Cost: ONE shuffle on the join key (exactly what a sort-merge equi
join would pay) + a sort within partitions — linear, skew-tolerant
(AQE), and no pair blowup.  This is the composition-of-built-ins
strategy for operators Spark lacks; the sort-merge work stays fully
JVM-side (no Python).

The right side must be unique per (key, ts) for deterministic output
(same contract DuckDB's ASOF JOIN assumes); dedupe upstream with a
groupBy when needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on key ``on``: each left row
    gets the right row with the greatest ``right_ts <= left_ts``
    (equal timestamps match, like DuckDB's ``ON l.ts >= r.ts``).

    Right payload columns come back with an ``asof_`` prefix
    (including ``asof_<right_ts>``).  ``how='left'`` keeps unmatched
    left rows with NULL payload; ``'inner'`` drops them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    payload_cols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in payload_cols])

    # side marker 0 sorts right rows BEFORE left rows at equal ts, so
    # an exactly-simultaneous right row is visible to the left row
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in left.columns if c != on],
    )

    w = (
        Window.partitionBy(on)
        .orderBy("_asof_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r.select(*l.columns))
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_match").isNotNull())
    out_left = [c for c in left.columns if c != on]
    return matched.select(
        F.col(on),
        *[F.col(c) for c in out_left],
        *[F.col(f"_match.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
