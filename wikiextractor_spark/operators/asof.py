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

    **Skew caveat**: the window's ``partitionBy(on)`` puts each key's
    ENTIRE history in one task, and AQE cannot split window
    partitions (it splits shuffle-join partitions only) — a
    pathological hot key (e.g. the catch-all NULL/anonymous user)
    becomes an unsplittable straggler, the same exposure a sort-merge
    join has on that key.  Mitigations: pre-filter known hot keys, or
    use :func:`asof_join_bucketed`, which splits each key's timeline
    into coarse time buckets (per-bucket windows + a boundary carry on
    the tiny (key, bucket) grain) so a hot key parallelizes across
    buckets.
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


def _ts_long(df: DataFrame, ts_col: str):
    """Event time as a sortable BIGINT (micros for timestamps)."""
    if df.schema[ts_col].dataType.simpleString().startswith("timestamp"):
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    return F.col(ts_col).cast("long")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """As-of join with a coarse time-bucket pre-split — the hot-key
    mitigation for :func:`asof_join`.

    Instead of one window over each key's whole history, the timeline
    is cut into ``bucket_width`` slices (micros for timestamp columns,
    raw units for numerics; non-negative times assumed):

    1. per (key, bucket): the same union + running-``last()`` finds
       each left row's latest right payload WITHIN its bucket — hot
       keys now split across as many tasks as they span buckets;
    2. per (key, bucket): one agg keeps the bucket's last right
       payload; a running-``last()`` over the (key, bucket) spine —
       thousands of times smaller than the row grain — carries
       payloads across bucket boundaries (empty buckets are skipped
       naturally, the spine only holds populated buckets);
    3. each left row resolves ``coalesce(intra-bucket match, carry)``.

    Two extra small shuffles buy straggler-free hot keys; identical
    semantics to :func:`asof_join` (property-tested equal).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    payload_cols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in payload_cols])

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.floor(_ts_long(right, right_ts) / F.lit(bucket_width)).cast("long").alias("_bucket"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.floor(_ts_long(left, left_ts) / F.lit(bucket_width)).cast("long").alias("_bucket"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in left.columns if c != on],
    )
    u = l.unionByName(r.select(*l.columns))

    w_bucket = (
        Window.partitionBy(on, "_bucket")
        .orderBy("_asof_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lefts = (
        u.withColumn("_intra", F.last("_payload", ignorenulls=True).over(w_bucket))
        .filter(F.col("_side") == 1)
    )

    bucket_last = (
        r.groupBy(on, "_bucket")
        .agg(
            F.max(
                F.struct(
                    _ts_long(r, "_asof_ts").alias("t"),
                    F.col("_payload").alias("p"),
                )
            ).alias("_m")
        )
        .select(on, "_bucket", F.col("_m.p").alias("_bl"))
    )
    spine = (
        u.select(on, "_bucket").distinct()
        .join(bucket_last, [on, "_bucket"], "left")
    )
    w_spine = (
        Window.partitionBy(on)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.withColumn(
        "_carry", F.last("_bl", ignorenulls=True).over(w_spine)
    ).select(on, "_bucket", "_carry")

    matched = (
        lefts.join(carry, [on, "_bucket"], "left")
        .withColumn("_match", F.coalesce("_intra", "_carry"))
    )
    if how == "inner":
        matched = matched.filter(F.col("_match").isNotNull())
    out_left = [c for c in left.columns if c != on]
    return matched.select(
        F.col(on),
        *[F.col(c) for c in out_left],
        *[F.col(f"_match.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
