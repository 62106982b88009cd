"""Deterministic sampling for training-data mixing.

``df.sample()`` is seed-dependent per partitioning and non-reproducible
across runs/cluster layouts; training-data pipelines need sampling
that is a pure function of the ROW so reruns, backfills, and
train/eval splits agree everywhere.  Both operators here gate on
md5 of a key column — narrow, shuffle-free (the per-group cap pays
one shuffle on the group key), engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def _hash_bucket(col, salt: str):
    """md5-derived uniform bucket in [0, 1e6) — a pure function of
    (value, salt), identical on any engine with md5.  NULL keys hash
    via a sentinel so they get a deterministic fate: without the
    coalesce, ``md5(concat(NULL, salt))`` is NULL, the gate predicate
    is NULL, and NULL-key rows silently vanish even at fraction=1.0 —
    silent data loss in a training-data prep operator."""
    h = F.md5(
        F.concat(F.coalesce(col.cast("string"), F.lit("<null>")), F.lit(salt))
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def _hash_u60(col, salt: str):
    """md5-derived uniform 60-bit value in [0, 2^60) — the FULL-WIDTH
    sibling of :func:`_hash_bucket` (same NULL sentinel, same
    engine-reproducibility argument) for consumers that take a modulus
    of their own: ``% (n + 1)`` over a 60-bit draw carries bias of
    order n/2^60 where the 1e6-bucket gate's would be n/1e6 — the
    difference between negligible and visible exactly when n is large
    (r12 VERDICT: FIM cuts on >1M-token streams).  15 hex chars keep
    the value positive in a signed BIGINT on every engine."""
    h = F.md5(
        F.concat(F.coalesce(col.cast("string"), F.lit("<null>")), F.lit(salt))
    )
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash-gating ``key_col``:
    the same key always lands on the same side of the gate, so samples
    are reproducible and CONSISTENT across tables sharing the key
    (sample users, get all their events).  Different ``salt`` values
    draw independent samples — disjoint train/eval splits come from
    complementary gates on one salt, not two salts."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(
        _hash_bucket(F.col(key_col), salt) < int(round(fraction * _BUCKETS))
    )


def cap_per_group(
    df: DataFrame, group_cols: list[str], k: int, id_col: str,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``k`` rows per group — the down-sampling step that
    stops a few giant groups (one domain, one language, one user)
    from dominating a training mix.  Selection is deterministic:
    rows are ranked by the md5 of their id (a reproducible shuffle),
    tie-broken by id.  One shuffle on the group key."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _token_count_expr(token_col: str | None, text_col: str):
    """The one definition of "token count" the token-grain samplers
    share (cap_group_tokens, sample_token_budget): an explicit count
    column when the grain carries one, else whitespace tokens."""
    return (
        F.col(token_col) if token_col
        else F.size(F.split(F.col(text_col), " "))
    )


def cap_group_tokens(
    df: DataFrame, group_cols: list[str], max_tokens: int,
    id_col: str = "doc_id", token_col: str | None = None,
    text_col: str = "text", salt: str = "",
) -> DataFrame:
    """Keep at most ~``max_tokens`` TOKENS per group — the
    RefinedWeb/Gopher-style mix control at the token grain
    (:func:`cap_per_group` caps row counts, but a domain of few huge
    documents can dominate a token budget while staying under any
    row cap).

    Per group, rows are ranked by the md5 of their id (the same
    reproducible shuffle every sampler here uses, ties to the id) and
    kept while the cumulative token count BEFORE the row is under the
    cap — so every non-empty group keeps at least its first-ranked
    row, and the overshoot is bounded by the LAST KEPT row's tokens
    (an include-own-count gate would instead silently empty any
    group whose first row alone exceeds the cap).

    One shuffle on the group key; the running sum is a per-group
    window (group partitions must fit a task — the same contract as
    every per-group window here).  Deterministic given (data, salt).
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    n_tok = _token_count_expr(token_col, text_col).cast("long")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(_hash_bucket(F.col(id_col), salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # collision-safe scratch column: clobbering a caller's column of
    # the same name would silently drop their data
    cum = "_cum_before"
    while cum in df.columns:
        cum += "_"
    return (
        df.withColumn(cum, F.coalesce(F.sum(n_tok).over(w), F.lit(0)))
        .filter(F.col(cum) < max_tokens)
        .drop(cum)
    )


def split_train_eval(
    df: DataFrame, key_col: str, eval_fraction: float, salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """→ ``(train, eval)``: a disjoint, exhaustive, reproducible split
    by complementary gates on ONE hash — every key lands in exactly
    one side, holdout membership never drifts between runs, and keys
    shared across tables (a user's documents and events) land on the
    SAME side when split with the same salt.  Two filters over one
    narrow hash — no shuffle, no sampling bias from data order."""
    if not 0.0 <= eval_fraction <= 1.0:
        raise ValueError(f"eval_fraction must be in [0, 1], got {eval_fraction}")
    gate = int(round(eval_fraction * _BUCKETS))
    bucket = _hash_bucket(F.col(key_col), salt)
    return df.filter(bucket >= gate), df.filter(bucket < gate)


def stratified_sample(
    df: DataFrame, group_col: str, fractions: dict, key_col: str,
    default_fraction: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-group hash-gate sampling — the mix-rebalancing step: keep
    ``fractions[group]`` of each group's keys (``default_fraction``
    for unlisted groups).  The per-group thresholds fold into ONE
    narrow CASE expression (groups are mix buckets — languages,
    sources, quality bands — so the dict is small by construction);
    selection stays deterministic and cross-table consistent exactly
    like :func:`deterministic_sample`.  No shuffle.

    A ``None`` key in ``fractions`` gates the NULL group explicitly
    (``==`` can never match NULL, so without it NULL-group rows take
    ``default_fraction``) — data-derived dicts like
    :func:`temperature_mix`'s need this, since real corpora carry
    NULL domains."""
    for g, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    gate = F.lit(int(round(default_fraction * _BUCKETS)))
    # sort on the stringified key: group values may be mixed-type or
    # None (sorted() would TypeError), and the order only needs to be
    # deterministic for plan stability, not semantically meaningful
    for g, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        cond = (
            F.col(group_col).isNull()
            if g is None
            else F.col(group_col) == F.lit(g)
        )
        gate = F.when(cond, F.lit(int(round(frac * _BUCKETS)))).otherwise(gate)
    return df.filter(_hash_bucket(F.col(key_col), salt) < gate)


def temperature_mix(
    df: DataFrame, group_col: str, alpha: float = 0.7,
    key_col: str = "doc_id", target_rows: int | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-reweighted domain mixing — the multinomial
    α-sampling used to rebalance multilingual / multi-domain LLM
    corpora (XLM-R / mBERT style): domain weights ``q_d ∝ p_d^α``
    where ``p_d = n_d / N``, so α=1 keeps the natural mix and α→0
    flattens toward uniform, up-weighting low-resource domains.

    Per-domain keep-rates ``min(1, target·q_d / n_d)`` are derived
    from ONE count aggregate (domains are mix buckets — languages,
    sources — so the count table is driver-sized by construction) and
    applied through the same deterministic hash gate as
    :func:`stratified_sample`: narrow, shuffle-free, reproducible,
    cross-table consistent on ``key_col``.  ``target_rows`` defaults
    to N (pure re-weighting at roughly constant size); rates cap at 1
    — this operator never up-SAMPLES a domain (no row duplication),
    it re-weights by down-sampling the others, the standard
    one-epoch-corpus formulation.
    """
    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_rows is not None and target_rows < 0:
        raise ValueError(f"target_rows must be >= 0, got {target_rows}")
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    if total == 0:
        return df
    target = total if target_rows is None else target_rows
    weights = {g: (n / total) ** alpha for g, n in counts.items()}
    z = sum(weights.values()) or 1.0
    fractions = {
        g: min(1.0, (target * weights[g] / z) / counts[g]) for g in counts
    }
    return stratified_sample(
        df, group_col, fractions, key_col, default_fraction=0.0, salt=salt
    )


def sample_token_budget(
    df: DataFrame, budget_tokens: int, id_col: str = "doc_id",
    token_col: str | None = None, text_col: str = "text",
    salt: str = "budget",
) -> DataFrame:
    """Reproducible ~``budget_tokens``-sized subset ("give me a 10B
    token slice of this corpus"): one aggregate pass measures the
    total token count, the keep-fraction is ``budget / total``, and
    selection is the same hash gate as :func:`deterministic_sample` —
    narrow, shuffle-free, cross-table consistent on ``id_col``.

    The returned sample's token count is budget ± sampling noise
    (relative error ~1/√n_kept_docs — fractions of a percent at
    corpus scale), which is the scale-correct contract: hitting the
    budget EXACTLY requires a global running sum over a total order —
    a single-partition window no 100 TB corpus should pay for a
    tolerance nobody needs.  Token counting uses ``token_col`` when
    the grain already carries one (e.g. chunked output), else
    whitespace tokens of ``text_col``.

    Deterministic given (corpus, salt): the measured total is a pure
    function of the data, so reruns gate identically.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    n_tok = _token_count_expr(token_col, text_col)
    total = df.select(
        F.sum(n_tok.cast("long")).alias("t")
    ).collect()[0]["t"] or 0
    if total <= budget_tokens:
        return df
    fraction = budget_tokens / total
    return deterministic_sample(df, id_col, fraction, salt)


def upsample_groups(
    df: DataFrame, group_col: str, factors: dict,
    key_col: str = "doc_id", salt: str = "epoch",
) -> DataFrame:
    """Repeat each group's rows by a (possibly fractional) factor —
    the up-sampling half of mix control that :func:`temperature_mix`
    deliberately leaves out: multi-epoch repetition of small
    high-quality domains (wiki ×3.5, books ×2) while the rest of the
    corpus stays at one epoch.

    A factor ``f`` becomes ``floor(f)`` full copies of every row plus
    one extra copy for the deterministic hash-gated ``f - floor(f)``
    fraction of keys — so the group's expected token multiple is
    exactly ``f`` and reruns reproduce the same extra-copy set.
    Copies are distinguished by an ``epoch`` column (0-based) so
    downstream shard assignment / packing can spread repeats instead
    of co-locating them; callers that need unique ids re-key on
    ``(key, epoch)``.

    Shape: one narrow ``explode(sequence(...))`` — row multiplication
    with NO shuffle and no driver-side data.  Groups absent from
    ``factors`` default to 1.0 (one epoch, ``epoch=0``); a factor of
    0 drops the group.  Factors must be in [0, 10000] — epoch counts
    are single-to-double digits in practice, and the cap turns a
    misplaced-decimal factor (1e9 rows per row) into a loud error
    instead of a cluster-sized explode.
    """
    for g, f in factors.items():
        if not (0.0 <= f <= 10_000.0):
            raise ValueError(
                f"factor for group {g!r} must be in [0, 10000], got {f!r}"
            )
    if "epoch" in df.columns:
        raise ValueError("df already has an 'epoch' column")

    # per-row full-copy count and fractional remainder, as one CASE
    # chain over the (driver-sized) factor table
    whole = F.lit(1)
    frac_gate = F.lit(0)
    for g, f in sorted(factors.items(), key=lambda kv: str(kv[0])):
        cond = (
            F.col(group_col).isNull()
            if g is None
            else F.col(group_col) == F.lit(g)
        )
        whole = F.when(cond, F.lit(int(f))).otherwise(whole)
        frac_gate = F.when(
            cond, F.lit(int(round((f - int(f)) * _BUCKETS)))
        ).otherwise(frac_gate)

    n_copies = whole + (
        _hash_bucket(F.col(key_col), salt) < frac_gate
    ).cast("int")
    # collision-safe scratch column: clobbering a caller's column of
    # the same name would silently drop their data
    n = "_n_copies"
    while n in df.columns:
        n += "_"
    return (
        df.withColumn(n, n_copies)
        .filter(F.col(n) > 0)
        .withColumn("epoch", F.explode(F.expr(f"sequence(0, `{n}` - 1)")))
        .drop(n)
    )


def weighted_sample(
    df: DataFrame, weight_col: str, target_fraction: float | None = None,
    key_col: str = "doc_id", salt: str = "wsample",
) -> DataFrame:
    """Soft quality filtering: keep each row with probability
    PROPORTIONAL to ``weight_col`` instead of hard-thresholding —
    the DCLM/FineWeb-style alternative to a binary quality gate
    (high scorers almost surely survive, low scorers survive at a
    rate that preserves some tail diversity).

    Keep rule: ``hash_bucket(key) < min(1, scale · w / w_max) · B``
    — the same deterministic md5 gate as every sampler here, so the
    draw is reproducible and cross-table consistent on ``key_col``.
    Without ``target_fraction``, ``scale = 1`` (the max-weight row
    keeps with probability 1).  With it, ``scale`` is solved from
    one aggregate so the UNCLIPPED expected keep-rate equals the
    target; rows whose scaled probability clips at 1 bias the
    realized fraction LOW (stated: an exact fixed point needs
    iteration no one-pass sampler should pay for).

    Rows with NULL, NaN, or non-positive weight are dropped (stated —
    they have no meaningful keep-probability) and are EXCLUDED from
    the calibration stats too: a single NaN would otherwise poison
    ``max``/``sum`` (Spark orders NaN above every double) and
    silently disable the proportionality, and negative weights would
    deflate the solved scale.  ``target_fraction`` is therefore
    relative to the VALID (positive-weight) population.  An input
    with no valid rows returns an empty frame, like every other
    sampler in this module.  One aggregate pass over the valid rows,
    then one narrow filter.
    """
    if target_fraction is not None and not 0.0 < target_fraction <= 1.0:
        raise ValueError(
            f"target_fraction must be in (0, 1], got {target_fraction}"
        )
    w = F.col(weight_col)
    valid = df.filter(
        w.isNotNull() & ~F.isnan(w.cast("double")) & (w > 0)
    )
    stats = valid.agg(
        F.max(weight_col).alias("mx"), F.sum(weight_col).alias("sm"),
        F.count(weight_col).alias("n"),
    ).first()
    if not stats["n"]:
        return valid  # empty frame, original schema
    mx, sm, n = float(stats["mx"]), float(stats["sm"]), int(stats["n"])
    if target_fraction is None:
        scale = 1.0
    else:
        # E[w/mx] = sm / (n * mx); scale so scale * E[w/mx] = target
        scale = target_fraction * n * mx / sm
    p = F.least(F.lit(1.0), F.lit(scale) * w / F.lit(mx))
    gate = (p * F.lit(_BUCKETS)).cast("long")
    return valid.filter(_hash_bucket(F.col(key_col), salt) < gate)


def assign_splits(
    df: DataFrame, fractions: dict[str, float],
    key_col: str = "doc_id", salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Append ``out_col``: a deterministic train/val/test (any number
    of named splits) assignment that is a pure function of
    ``(key_col, salt)`` — the LEAKAGE-SAFE construction: pass a GROUP
    key (near-dup cluster id from ``dedup_near``, canonical URL
    domain, source id) and every row sharing it lands in the SAME
    split, so near-duplicates can never straddle train and eval (the
    classic contamination failure a row-wise random split guarantees
    at corpus scale).  Use ``key_col='doc_id'`` only when no
    cross-row leakage relation exists.

    ``fractions`` maps split name → fraction; fractions must be
    positive and sum to 1 (±1e-9 — a remainder would silently drop
    rows, the deterministic_sample NULL-gate lesson).  Assignment is
    by cumulative ranges over the shared md5 bucket
    (:func:`_hash_bucket` — same NULL-sentinel fate, same
    cross-engine reproducibility; boundaries quantize to the 1e6
    bucket grain, so realized fractions are exact to 1e-6).
    Insertion order of ``fractions`` fixes the ranges — reordering
    the dict is a different (still valid) assignment, stated.

    Zero shuffle: one narrow projection (the gate is a pure
    per-row expression), so it composes anywhere in a plan."""
    if not fractions:
        raise ValueError("assign_splits: need at least one split")
    bad = [
        n for n in fractions
        if not isinstance(n, str) or n == ""
    ]
    if bad:
        raise ValueError(
            f"assign_splits: {len(bad)} split names are empty or not "
            "strings"
        )
    vals = list(fractions.values())
    if any(
        isinstance(v, bool) or not isinstance(v, (int, float))
        or not v > 0
        for v in vals
    ):
        raise ValueError(
            f"assign_splits: fractions must be positive numbers, got "
            f"{fractions!r}"
        )
    total = float(sum(vals))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"assign_splits: fractions sum to {total!r}, not 1 — a "
            "remainder would silently drop rows; make the split "
            "exhaustive"
        )
    bucket = _hash_bucket(F.col(key_col), salt)
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += float(fractions[name])
        cond = bucket < F.lit(int(round(cum * _BUCKETS)))
        expr = (
            F.when(cond, F.lit(name)) if expr is None
            else expr.when(cond, F.lit(name))
        )
    # the last split takes the remainder range — immune to float
    # accumulation at the top boundary
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)
