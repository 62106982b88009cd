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
1b. **Bounded merge (tiny shuffle)**: the per-task summaries feed a
   weighted Misra-Gries merge tree (MG summaries are mergeable with
   no error-bound loss) that caps the candidate set at
   ``max_candidates`` rows — the broadcast width is a hard constant,
   NOT m × n_tasks (which at 100k-task scale would be a ~20M-row
   broadcast).
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


def _mg_decrement(counts: dict, cap: int) -> dict:
    """One Misra-Gries decrement step: subtract the (cap+1)-th largest
    count everywhere and drop non-positives — ≤ cap survivors, each an
    underestimate by at most the total decremented mass."""
    if len(counts) <= cap:
        return counts
    thresh = heapq.nlargest(cap + 1, counts.values())[cap]
    return {v: c - thresh for v, c in counts.items() if c > thresh}


def candidate_values(
    src: DataFrame, m: int, max_candidates: int, merge_parallelism: int,
) -> DataFrame:
    """The bounded candidate stage of :func:`heavy_hitters`: per-task
    Misra-Gries summaries, then a weighted MG MERGE TREE that caps the
    final candidate set at ``max_candidates`` rows no matter how many
    tasks contributed.

    Without the merge, the candidate union is bounded only by
    m × n_tasks — at 100k-task corpus scale with m=200 that is a
    ~20M-row broadcast, past any sane broadcast budget.  MG summaries
    are mergeable (Agarwal et al., "Mergeable Summaries": merging
    size-M summaries yields a size-M summary with the combined
    stream's n/(M+1) error bound), so two weighted merge levels give
    an EXPLICIT bound: level 1 hash-partitions partials by value over
    ``merge_parallelism`` tasks (same value always sums in one task)
    and caps each at ``max_candidates``; level 2 merges those in one
    task — fan-in ≤ max_candidates × merge_parallelism rows — and
    caps the result at ``max_candidates``."""

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
            counts = _mg_decrement(counts, m)
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(top[:m], columns=["value", "n_local"])

    schema = "value string, n_local long"
    partials = src.mapInPandas(_local_top, schema=schema)
    return merge_candidate_partials(partials, max_candidates, merge_parallelism)


def merge_candidate_partials(
    partials: DataFrame, max_candidates: int, merge_parallelism: int,
) -> DataFrame:
    """The merge-tree half of :func:`candidate_values`, split out so a
    caller that produced the per-task summaries itself (e.g. a pass
    that also tallies totals — :func:`heavy_hitters_with_total`) can
    reuse the bounded two-level weighted merge."""

    def _merge_weighted(iterator):
        counts: dict[str, int] = {}
        for pdf in iterator:
            for v, c in zip(pdf["value"], pdf["n_local"]):
                counts[v] = counts.get(v, 0) + int(c)
            counts = _mg_decrement(counts, max_candidates)
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(
            top[:max_candidates], columns=["value", "n_local"]
        )

    schema = "value string, n_local long"
    level1 = partials.repartition(merge_parallelism, "value").mapInPandas(
        _merge_weighted, schema=schema
    )
    return (
        level1.repartition(1)
        .mapInPandas(_merge_weighted, schema=schema)
        .select("value")
    )


def _checked_params_and_src(
    df: DataFrame, col: str, k: int,
    candidates_per_partition: int, max_candidates: int | None,
) -> tuple[DataFrame, int]:
    """Shared validation + source projection of the two heavy-hitter
    entry points; returns ``(src, cap)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = candidates_per_partition
    if m < k:
        raise ValueError(
            f"candidates_per_partition ({m}) must be >= k ({k})"
        )
    cap = max_candidates if max_candidates is not None else 16 * m
    if cap < k:
        raise ValueError(f"max_candidates ({cap}) must be >= k ({k})")
    src = df.select(F.col(col).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )
    return src, cap


def _exact_topk(src: DataFrame, candidates: DataFrame, k: int) -> DataFrame:
    """Shared exact-recount stage: re-count ONLY candidate values via
    a broadcast semi-join, shuffle just candidate rows."""
    return (
        src.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "value")
        .limit(k)
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20,
    candidates_per_partition: int = 200,
    max_candidates: int | None = None,
    merge_parallelism: int = 32,
) -> DataFrame:
    """→ ``(value, n)``: the top-``k`` most frequent values of ``col``
    with exact counts, without shuffling the full distinct-value set.

    ``max_candidates`` (default ``16 × candidates_per_partition``) is
    the HARD width of the broadcast candidate set — the recall knob at
    the global grain, as ``candidates_per_partition`` is at the task
    grain.  Survival guarantee, error terms summed over the tree: the
    per-task summaries under-count by at most n/(m+1) total and each
    of the two merge levels decrements at most n/(max_candidates+1)
    more, so any value with true frequency
    **> n/(m+1) + 2·n/(max_candidates+1)** is guaranteed a candidate
    slot (with the default cap = 16m that bound is ≈ 1.125·n/(m+1),
    i.e. the task-grain knob dominates).
    """
    src, cap = _checked_params_and_src(
        df, col, k, candidates_per_partition, max_candidates
    )
    candidates = candidate_values(
        src, candidates_per_partition, cap, merge_parallelism
    )
    return _exact_topk(src, candidates, k)


def heavy_hitters_with_total(
    df: DataFrame, col: str, k: int = 20,
    candidates_per_partition: int = 200,
    max_candidates: int | None = None,
    merge_parallelism: int = 32,
) -> tuple[DataFrame, int]:
    """:func:`heavy_hitters` plus the EXACT total row count, tallied
    INSIDE the candidate pass — for callers (the unigram-LM fit) that
    need both the top-k and the grand total and would otherwise pay a
    separate full ``count()`` scan for a single scalar.

    Each task's Misra-Gries pass already streams every row, so it
    also sums its row count and emits it as one sentinel row
    (``value = NULL`` — impossible as a candidate, NULLs are filtered
    before the pass).  The per-task summaries are materialized once
    (they are tiny: ≤ m+1 rows per task), then the total is a sum over
    sentinels and the candidate set is the usual bounded merge tree —
    the corpus itself is scanned once for candidates+total and once
    for the exact recount, never a third time.

    → ``(topk_df, total)``; the count happens eagerly.
    """
    src, cap = _checked_params_and_src(
        df, col, k, candidates_per_partition, max_candidates
    )
    m = candidates_per_partition

    def _local_top_and_total(iterator):
        counts: dict[str, int] = {}
        total = 0
        for pdf in iterator:
            total += len(pdf)
            for v, c in pdf["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            counts = _mg_decrement(counts, m)
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(
            top[:m] + [(None, total)], columns=["value", "n_local"]
        )

    partials = src.mapInPandas(
        _local_top_and_total, schema="value string, n_local long"
    ).localCheckpoint(eager=True)
    total_row = (
        partials.filter(F.col("value").isNull())
        .agg(F.sum("n_local").alias("t"))
        .collect()[0]
    )
    total = int(total_row["t"] or 0)
    candidates = merge_candidate_partials(
        partials.filter(F.col("value").isNotNull()), cap, merge_parallelism
    )
    return _exact_topk(src, candidates, k), total
