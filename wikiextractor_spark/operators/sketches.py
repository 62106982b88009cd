"""Sketch-flavored frequency analysis: distributed heavy hitters.

``groupBy(value).count().orderBy(desc)`` over a token/domain/n-gram
grain shuffles EVERY distinct value — at 100 TB that's the biggest
shuffle in the pipeline for an answer that only needs the top-k.
The classic two-pass shape avoids it:

1. **Candidate pass (narrow)**: each partition maintains a
   **Misra-Gries summary** capped at ``m`` counters (``mapInPandas``;
   per Arrow batch a pandas ``value_counts`` merges into the summary,
   then the (m+1)-th largest count is subtracted from every counter
   and non-positive counters drop — the mergeable-summaries form of
   the decrement step).  Memory is O(m + one Arrow batch's distinct
   values) regardless of how many distinct values the task sees —
   unlike an exact per-task dict, which on a token/n-gram grain holds
   every distinct value and can OOM the task.  The guarantee is the
   standard MG one: any value with true local frequency
   > n_task/(m+1) survives with a positive (under-)count, so a global
   heavy hitter — which by averaging is a local heavy hitter in at
   least one partition — always reaches the candidate union;
   ``candidates_per_partition`` is the explicit recall/width knob.
2. **Exact pass (small shuffle)**: re-count ONLY candidate values —
   the corpus streams once more through a broadcast semi-join on the
   candidate set, and the final groupBy shuffles just candidate rows.

Counts in the result are EXACT (second pass), not estimates; the
approximation is only in which values make the candidate list.
"""

from __future__ import annotations

import heapq

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

    m = candidates_per_partition

    def _local_top(iterator):
        # ONE Misra-Gries summary per TASK (not per Arrow batch):
        # partial counts merge across batches so a value spread thinly
        # over many batches still surfaces as a local heavy hitter.
        # The summary never exceeds m entries between batches; the
        # decrement step runs at most once per batch.
        counts: dict[str, int] = {}
        for pdf in iterator:
            for v, c in pdf["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > m:
                # subtract the (m+1)-th largest count everywhere and
                # drop non-positives: ≤ m survivors, each counter an
                # underestimate by at most the total decremented mass
                thresh = heapq.nlargest(m + 1, counts.values())[m]
                counts = {v: c - thresh for v, c in counts.items()
                          if c > thresh}
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(top[:m], columns=["value", "n_local"])

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
