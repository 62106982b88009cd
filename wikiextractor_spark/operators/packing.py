"""Sequence packing for LLM training-data prep: assign documents (or
chunks) to fixed token-budget packs so concatenated training sequences
waste as little of the context window as possible.

Bin packing is inherently sequential, so this is one of the few
operators where ``applyInPandas`` is the right tool rather than a
fallback: the corpus is hash-partitioned into independent groups, each
group runs first-fit-decreasing (FFD) in pandas, and pack ids are made
globally unique by offsetting with the group key.  No stage ever sees
more than one group, so the operator scales horizontally: packing
quality is within the usual FFD bound (≤ 11/9·OPT + 1 bins) per
group, and group boundaries cost at most one under-filled pack each.

Only the (id, n_tokens) projection travels through Python — never the
text — so the Arrow traffic per row is two longs.  Joining the
assignment back to the full rows is one co-partitioned shuffle on the
id, stated in the docstring rather than hidden inside the operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_GROUP_SHIFT = 32  # pack_id = group_key << 32 | local pack index


def pack_sequences(
    df: DataFrame, token_col: str = "n_tokens", id_col: str = "doc_id",
    budget: int = 2048, num_groups: int = 64,
) -> DataFrame:
    """→ ``(id, n_tokens, pack_id, over_budget)``: every input row
    assigned to exactly one pack; for every pack with
    ``over_budget = false``, ``sum(n_tokens) <= budget``.

    Rows whose own token count exceeds ``budget`` get a dedicated
    pack flagged ``over_budget = true`` (the caller decides whether to
    truncate, split, or drop them) — they never contaminate a normal
    pack.

    Determinism: group membership is ``pmod(hash(id), num_groups)``
    and FFD orders by (tokens desc, id), so the same inputs with the
    same ``num_groups`` always produce the same assignment —
    re-runnable mid-pipeline without invalidating downstream caches.

    Scale shape: ONE shuffle (the groupBy), then per-group Python over
    a two-column frame.  Size ``num_groups`` so a group's (id, tokens)
    pairs fit comfortably in one task's memory — 16 bytes/row means
    even 10⁸ rows per group is ~1.6 GB, so a 100 TB corpus of billions
    of chunks needs only thousands of groups.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if num_groups < 1:
        raise ValueError(f"num_groups must be >= 1, got {num_groups}")

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        group_key = int(pdf["_grp"].iloc[0])
        base = group_key << _GROUP_SHIFT
        capacities: list[int] = []  # remaining tokens per open pack
        pack_ids = []
        over = []
        for toks in pdf[token_col].astype("int64"):
            toks = int(toks)
            if toks > budget:
                capacities.append(0)  # dedicated, already full
                pack_ids.append(base + len(capacities) - 1)
                over.append(True)
                continue
            # first fit: tokens arrive in decreasing order, so open
            # packs fill front-to-back and the scan stays short
            for i, cap in enumerate(capacities):
                if toks <= cap:
                    capacities[i] = cap - toks
                    pack_ids.append(base + i)
                    break
            else:
                capacities.append(budget - toks)
                pack_ids.append(base + len(capacities) - 1)
            over.append(False)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["over_budget"] = pd.Series(over, dtype="bool")
        return pdf.drop(columns=["_grp"])

    proj = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias(token_col),
        F.pmod(F.hash(F.col(id_col)), F.lit(num_groups)).alias("_grp"),
    )
    out_schema = (
        f"{id_col} long, {token_col} long, pack_id long, over_budget boolean"
    )
    return proj.groupBy("_grp").applyInPandas(pack_group, schema=out_schema)


def pack_stats(packed: DataFrame, budget: int, token_col: str = "n_tokens") -> DataFrame:
    """→ one row: pack count, mean fill ratio, and wasted-token total
    over the non-over-budget packs — the packing-efficiency metrics a
    mix pipeline monitors."""
    per_pack = (
        packed.filter(~F.col("over_budget"))
        .groupBy("pack_id")
        .agg(F.sum(token_col).alias("pack_tokens"))
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.round(F.avg(F.col("pack_tokens") / F.lit(float(budget))), 6).alias(
            "mean_fill"
        ),
        F.sum(F.lit(budget) - F.col("pack_tokens")).alias("wasted_tokens"),
    )
