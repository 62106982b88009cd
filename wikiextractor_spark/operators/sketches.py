"""Sketch-flavored frequency analysis: distributed heavy hitters.

``groupBy(value).count().orderBy(desc)`` over a token/domain/n-gram
grain shuffles EVERY distinct value — at 100 TB that's the biggest
shuffle in the pipeline for an answer that only needs the top-k.
The classic two-pass shape avoids it:

1. **Candidate pass (narrow)**: each partition computes its local
   top-``m`` values (``mapInPandas`` + pandas ``value_counts`` — a
   per-batch hash aggregation, nothing crosses the wire but m rows
   per partition).  Any value with global frequency ≥ n/m must be a
   local heavy hitter in at least one partition (pigeonhole), so with
   m comfortably above k the true top-k is in the candidate union;
   ``candidates_per_partition`` is the explicit recall/width knob.
2. **Exact pass (small shuffle)**: re-count ONLY candidate values —
   the corpus streams once more through a broadcast semi-join on the
   candidate set, and the final groupBy shuffles just candidate rows.

Counts in the result are EXACT (second pass), not estimates; the
approximation is only in which values make the candidate list.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20,
    candidates_per_partition: int = 200,
) -> DataFrame:
    """→ ``(value, n)``: the top-``k`` most frequent values of ``col``
    with exact counts, without shuffling the full distinct-value set.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates_per_partition < k:
        raise ValueError(
            f"candidates_per_partition ({candidates_per_partition}) must be >= k ({k})"
        )
    src = df.select(F.col(col).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )

    def _local_top(iterator):
        # one counter per TASK (not per Arrow batch): partial counts
        # merge across batches so a value spread thinly over many
        # batches still surfaces as a local heavy hitter
        counts: dict[str, int] = {}
        for pdf in iterator:
            for v, c in pdf["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(
            top[:candidates_per_partition], columns=["value", "n_local"]
        )

    candidates = (
        src.mapInPandas(_local_top, schema="value string, n_local long")
        .select("value")
        .distinct()
    )
    return (
        src.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "value")
        .limit(k)
    )
