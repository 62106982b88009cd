"""Skew mitigation for hot join keys: salted replicated join.

At 100 TB a handful of hot keys (the `null` user, a viral document, a
default category) can put one shuffle partition hours behind the
rest.  AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`,
enabled by this engine's session tuning) fixes most sort-merge cases
at runtime; explicit salting remains the tool when

* the skewed side must join a MID-SIZED dimension (too big to
  broadcast, small enough to replicate a few times), or
* the engine can't see the skew up front (AQE splits only what the
  runtime statistics of a materialized stage reveal — not skew that
  appears after per-partition filters), or
* you need deterministic partition sizing (capacity planning).

``salted_join`` routes each fact row to one of ``buckets`` salted
copies of its key and replicates the dimension side ``buckets``× so
every salted key finds its match: the hot key's rows spread over
``buckets`` tasks at the cost of a ``buckets``× larger (but still
small) dimension shuffle.  Join RESULTS are identical to the plain
equi-join — salt only routes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` to ``dim`` on ``on`` with the fact side
    salted across ``buckets``.  ``how`` supports 'inner' and 'left'
    (the fact side is the preserved side; other types don't compose
    with replication).  Column names must be disjoint apart from
    ``on``."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    # row-id round-robin: spreads even identical rows of the hot key
    # (a content-hash salt would re-concentrate them)
    f = fact.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int"),
    )
    # (a generator can't nest inside cast(); sequence of int literals
    # already explodes to int, matching the fact side's cast)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, [on, "_salt"], how).drop("_salt")


def spread_for_compute(
    df: DataFrame, min_partitions: int | None = None,
) -> DataFrame:
    """Repartition a narrow frame so compute-bound passes use every
    core — a NO-OP whenever upstream already has enough splits.

    Sketch/signature passes (MinHash, SimHash, Arrow-UDF chains) cost
    far more CPU per row than the scan that feeds them.  When the
    input layout is unsplittable below its file/row-group grain (one
    bz2 dump, a single-row-group parquet — parquet cannot split inside
    a row group), the scan's parallelism caps the whole pipeline: a
    32-core executor runs a 2-split corpus on 2 cores.  Spreading the
    narrow (id, text) projection first costs one shuffle of the
    projected columns and unlocks full parallelism (measured 2.3 s →
    1.1 s on the sf0.1 SimHash pipeline, single-row-group input).

    At corpus scale the condition never fires: 100 TB of parquet has
    orders of magnitude more splits than the cluster has slots, so the
    frame passes through untouched — this is explicitly NOT a
    repartition-always (which would shuffle the full corpus for
    nothing).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
