"""Range join: match point rows to interval rows with
``lo <= point < hi`` without a nested-loop pair explosion.

Spark plans a bare inequality join as BroadcastNestedLoopJoin (or a
cartesian product when neither side fits in memory) — O(points ×
intervals).  This operator uses the standard binning composition:

1. explode every interval into the fixed-width buckets it covers;
2. assign every point its single bucket (``floor(point / width)``);
3. equi-join on the bucket (ONE shuffle — or a broadcast when the
   exploded interval side is small, which AQE picks automatically);
4. re-check the exact predicate to discard same-bucket near-misses.

Cost: linear in points + (intervals × buckets-per-interval).  Pick
``bucket_width`` near the typical interval length so most intervals
explode into a handful of buckets; a width far too small re-creates
the explosion, far too large degrades to per-bucket mini-cartesians
(the exact filter keeps it correct either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them
    (``lo <= point < hi``, half-open).  Column names must be disjoint
    across the two inputs apart from the join machinery's ``_bucket``.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(float(bucket_width))
    ints = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)
            )
        ),
    )
    pts = points.withColumn("_bucket", F.floor(F.col(point_col) / w))
    return (
        pts.join(ints, "_bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bucket")
    )
