"""DSIR-style data selection: hashed n-gram importance resampling.

Given a small TARGET corpus (the distribution you want more of — e.g.
curated encyclopedic text) and the RAW crawl corpus, score every raw
document by how much more likely its hashed n-gram profile is under
the target distribution than under the raw distribution, then keep
the high-importance slice.  This is the published DSIR recipe (Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling"): features are word n-grams hashed into a fixed number of
buckets, both corpora reduce to bucket histograms, and a document's
log-importance weight is the sum over its n-grams of
``log p_target(bucket) - log p_raw(bucket)`` with add-alpha
smoothing.

100 TB shape
------------
* Each corpus reduces to ONE ``groupBy(bucket).count()`` over the
  exploded n-grams — map-side partial aggregation, shuffle payload at
  most ``buckets`` rows per task.  The target corpus is tiny by
  construction (a curated seed set against a 100 TB crawl).
* The weight table is ``buckets`` rows — a DRIVER-SIZED artifact by
  contract (``buckets`` is capped, raise-don't-spill) — collected
  once and inlined as one bucket-indexed array literal, like the broadcast
  vocab in ``functions/tokenizer``.
* Scoring is then a ZERO-SHUFFLE narrow projection: normalize →
  n-grams → md5 bucket → map lookup → integer fold, all inside
  whole-stage codegen.  No join, no explode survives into the scoring
  pass, nothing Python.  At 100 TB this is the only pass that touches
  every byte, and it runs at scan speed.
* Weights are QUANTIZED to integer micro-units (``round(w * 1e6)``)
  before the per-document sum: integer addition is order-independent,
  so the score is exactly reproducible across partitionings, engines,
  and re-runs — the same integerize-first discipline the money
  aggregates use.  The one float crossing (the log) happens once per
  BUCKET, not per document.

Normalization and n-gram construction mirror ``operators/decontam``
(lowercase, strip non-alphanumerics, whole-doc gram for short docs)
so the two hygiene passes agree on what a "word" is.  The md5 bucket
construction mirrors ``operators/sampling._hash_bucket`` (first 8 hex
chars as an integer), restatable by any engine with md5.

Selection modes:

* ``select_by_weight`` — deterministic integer-threshold gate
  (driver-verifiable end to end).
* ``gumbel_topk`` — the paper's importance RESAMPLING via
  deterministic Gumbel-top-k (noise derived from the md5 bucket of
  the doc id, so the draw is reproducible given the salt).  The
  ordering key passes through driver-side float ``log``/division an
  independent engine cannot be guaranteed to reproduce at rank
  boundaries, so this mode is pytest-pinned (same stated boundary as
  ``sampling.temperature_mix``).

No reference counterpart (`/root/reference/WikiExtractor.py` has no
data-selection surface) — engine extension (SURVEY.md §2.12).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

# the SHARED normalization: importing (not copying) decontam's helper
# is what enforces "the two hygiene passes agree on what a word is" —
# an edit there cannot silently diverge here
from wikiextractor_spark.operators.decontam import _norm_words_sql

#: hard cap on the bucket count: the weight table is collected to the
#: driver and inlined as one array literal, so it must stay driver-sized.
MAX_BUCKETS = 65536

#: the ONE home of the fit/serve parameter defaults — function
#: signatures and parse_gate_opts all read these, so they cannot
#: drift apart
_DEFAULT_N, _DEFAULT_BUCKETS, _DEFAULT_SALT = 2, 512, "dsir"

_MICRO = 1_000_000


def _check_n(n: int) -> None:
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")


def _grams_expr(text_col: str, n: int) -> F.Column:
    """Array of normalized word ``n``-gram STRINGS; whole doc when
    shorter than ``n`` words (the decontam short-doc rule — a short
    target item still contributes its full sequence instead of
    silently vanishing).  Strings, not xxhash64: the bucket hash must
    be md5 so an independent engine can restate it."""
    return F.expr(
        f"""
        transform(array({_norm_words_sql(text_col)}), ws ->
          CASE WHEN size(ws) < {n}
               THEN array(concat_ws(' ', ws))
               ELSE transform(sequence(0, size(ws) - {n}),
                              i -> concat_ws(' ', slice(ws, i + 1, {n})))
          END)[0]
        """
    )


def _bucket_col(gram_col: F.Column, buckets: int, salt: str) -> F.Column:
    """md5-derived uniform bucket in ``[0, buckets)`` — the
    ``sampling._hash_bucket`` construction with a parametric modulus.
    A pure function of (gram, salt): identical on any engine with
    md5."""
    h = F.md5(F.concat(gram_col, F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def _check_buckets(buckets: int) -> None:
    if not 1 <= buckets <= MAX_BUCKETS:
        raise ValueError(
            f"buckets must be in [1, {MAX_BUCKETS}] (the weight table "
            f"is a driver-sized array literal), got {buckets}"
        )


def bucket_histogram(
    df: DataFrame, text_col: str = "text", n: int = _DEFAULT_N,
    buckets: int = _DEFAULT_BUCKETS, salt: str = _DEFAULT_SALT,
) -> DataFrame:
    """→ ``(bucket, cnt)``: hashed n-gram bucket histogram of the
    corpus.  One map-side-combined aggregation; the shuffle payload is
    at most ``buckets`` rows per task regardless of corpus size."""
    _check_buckets(buckets)
    _check_n(n)
    grams = df.select(_grams_expr(text_col, n).alias("_grams"))
    return (
        grams.select(F.explode_outer("_grams").alias("_g"))
        # NULL text → NULL gram array → one NULL gram row from the
        # outer explode: drop it, so a NULL-text document contributes
        # nothing to the histogram instead of crashing the collected
        # weight table with a NULL bucket (non-NULL text never yields
        # NULL grams — concat_ws never returns NULL)
        .filter(F.col("_g").isNotNull())
        .select(_bucket_col(F.col("_g"), buckets, salt).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_weights(
    target_hist: DataFrame, raw_hist: DataFrame, buckets: int,
    alpha: float = 1.0,
) -> DataFrame:
    """→ ``(bucket, weight_micro)``: per-bucket log importance ratio
    ``ln((t+α)/(T+αB)) − ln((r+α)/(R+αB))`` quantized to BIGINT
    micro-units, for EVERY bucket in ``[0, buckets)`` — a TOTAL
    table.  Totality matters in the pre-fitted gating mode: a later
    corpus (a streaming batch with novel vocabulary) can hash grams
    into buckets neither fit corpus saw, and those must score the
    add-alpha smoothing weight the model assigns them — typically
    LARGE when raw ≫ target — not a silent 0.  All frames involved
    are ≤ ``buckets`` rows, so the spine join and the total-count
    cross joins are trivially small; the result is the driver-sized
    artifact ``dsir_scores`` inlines."""
    _check_buckets(buckets)
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    t_tot = target_hist.agg(F.sum("cnt").alias("t_total"))
    r_tot = raw_hist.agg(F.sum("cnt").alias("r_total"))
    spine = target_hist.sparkSession.range(buckets).select(
        F.col("id").alias("bucket")
    )
    joined = (
        spine.join(
            target_hist.withColumnRenamed("cnt", "t_cnt"), "bucket", "left"
        )
        .join(raw_hist.withColumnRenamed("cnt", "r_cnt"), "bucket", "left")
        .crossJoin(t_tot)
        .crossJoin(r_tot)
    )
    t = F.coalesce(F.col("t_cnt"), F.lit(0)).cast("double")
    r = F.coalesce(F.col("r_cnt"), F.lit(0)).cast("double")
    # empty-corpus totals coalesce to 0: weights degrade to the pure
    # smoothing ratio instead of NULLing the whole table
    tt = F.coalesce(F.col("t_total"), F.lit(0)).cast("double")
    rt = F.coalesce(F.col("r_total"), F.lit(0)).cast("double")
    ab = float(alpha) * buckets
    w = (
        F.log((t + F.lit(float(alpha))) / (tt + F.lit(ab)))
        - F.log((r + F.lit(float(alpha))) / (rt + F.lit(ab)))
    )
    return joined.select(
        "bucket",
        F.round(w * _MICRO).cast("long").alias("weight_micro"),
    )


def parse_gate_opts(
    dsir_opts: dict | None, *, allow_alpha: bool = True,
) -> tuple[float, dict]:
    """Validate and split the ``dsir_opts`` dict the corpus-prep gate
    takes → ``(alpha, {n, buckets, salt})``.  Exposed so the
    STREAMING flow can fail on a typo'd key at stream definition,
    not inside the first micro-batch.  ``allow_alpha=False`` is the
    pre-fitted mode: alpha only affects the FIT, so accepting it
    there would silently change nothing — raise instead."""
    opts = dict(dsir_opts or {})
    if not allow_alpha and "alpha" in opts:
        raise ValueError(
            "dsir_opts['alpha'] only affects the fit — it has no "
            "effect when gating through pre-fitted dsir_weights"
        )
    alpha = opts.pop("alpha", 1.0)
    fit = {
        "n": opts.pop("n", _DEFAULT_N),
        "buckets": opts.pop("buckets", _DEFAULT_BUCKETS),
        "salt": opts.pop("salt", _DEFAULT_SALT),
    }
    if opts:
        raise ValueError(f"unknown dsir_opts keys: {sorted(opts)}")
    _check_buckets(fit["buckets"])
    _check_n(fit["n"])
    return alpha, fit


# eq=False: the Column field breaks dataclass value semantics —
# pyspark Column.__eq__ returns a Column (so generated __eq__ raises
# "Cannot convert column into bool") and Column.__hash__ is None (so
# the generated __hash__ raises).  Identity semantics are right for
# a collected artifact anyway.
@dataclass(frozen=True, eq=False)
class PrebuiltWeights:
    """The validated, collected weight artifact: the bucket-indexed
    ``array<bigint>`` literal Column plus the bucket count it was
    validated against.  Carrying the count WITH the Column is what
    lets the corpus-prep gates re-check a fit/serve buckets mismatch
    in pure Python — no per-call (or per-micro-batch) probe job, and
    no ambiguity about what the Column is (it is always the literal
    ``weight_map_column`` built, never an arbitrary expression)."""

    col: F.Column
    buckets: int


def weight_map_column(weights: DataFrame, buckets: int) -> PrebuiltWeights:
    """Collect the TOTAL ``[0, buckets)`` weight table and inline it
    as ONE bucket-indexed ``array<bigint>`` literal — the
    driver-sized broadcast step that makes scoring join-free.

    A single array Literal, not ``create_map(2·B literal exprs)``:
    the expression tree stays O(1) in the bucket count (at
    MAX_BUCKETS a map build would put 131072 expression nodes into
    the plan and codegen — the same plan-size class as the r9 rerank
    ``isin`` list this engine already replaced).  Validates totality
    the way ``load_sq_codec`` validates dims: buckets exactly
    ``0..buckets-1``, no gaps, no duplicates, raise-don't-guess."""
    _check_buckets(buckets)
    rows = weights.select("bucket", "weight_micro").collect()
    if not rows:
        raise ValueError("weights table is empty — fit it first")
    vals: list = [None] * buckets
    for row in rows:
        b = int(row["bucket"])
        if not 0 <= b < buckets:
            raise ValueError(
                f"weight table bucket {b} outside [0, {buckets}) — "
                "buckets mismatch between fit and serve?"
            )
        if vals[b] is not None:
            raise ValueError(f"duplicate bucket {b} in weight table")
        vals[b] = int(row["weight_micro"])
    missing = [i for i, v in enumerate(vals) if v is None]
    if missing:
        raise ValueError(
            f"weight table is not total: {len(missing)} of {buckets} "
            f"buckets missing (first: {missing[:5]}) — fit it with "
            "importance_weights, which emits every bucket"
        )
    return PrebuiltWeights(col=F.lit(vals), buckets=buckets)


def _fold_expr(
    wmap: F.Column, grams: F.Column, buckets: int, salt: str,
) -> F.Column:
    """Integer fold of per-gram bucket weights over an already-built
    gram array, indexing the total bucket-ordered weight array
    (1-based element_at).  NULL text → NULL array → NULL score, so
    threshold gates drop it (the content-classifier NULL contract);
    non-NULL grams always land in ``[0, buckets)``, so the lookup is
    total by the ``weight_map_column`` validation."""
    return F.aggregate(
        F.transform(
            grams,
            lambda g: F.element_at(
                wmap, (_bucket_col(g, buckets, salt) + 1).cast("int")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def score_column(
    wmap: F.Column, text_col: str = "text", n: int = _DEFAULT_N,
    buckets: int = _DEFAULT_BUCKETS, salt: str = _DEFAULT_SALT,
) -> F.Column:
    """The per-document log-weight as one narrow expression — an
    integer fold over the n-gram buckets through the literal weight
    map.  Usable directly as a pushdown-able filter predicate
    (``score_column(...) >= threshold``): no join, no shuffle, no
    Python."""
    _check_buckets(buckets)
    return _fold_expr(wmap, _grams_expr(text_col, n), buckets, salt)


def dsir_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    n: int = _DEFAULT_N,
    buckets: int = _DEFAULT_BUCKETS,
    salt: str = _DEFAULT_SALT,
) -> DataFrame:
    """Attach ``dsir_logw_micro`` (BIGINT sum of bucket weights over
    the document's n-grams; NULL for NULL text, so threshold gates
    drop those rows) and ``dsir_n_grams`` to every row of ``df``.

    The weight table is collected once (≤ ``buckets`` rows by the
    ``MAX_BUCKETS`` contract) and inlined as one array literal, so the
    scoring pass is a zero-shuffle, zero-join narrow projection — the
    shape that survives a 100 TB scan.  The gram array is bound in
    its own projection first (the decontam idiom) so the
    normalize+split pass evaluates ONCE per row even though both
    output columns consume it."""
    _check_buckets(buckets)
    wmap = weight_map_column(weights, buckets).col
    return (
        df.withColumn("_grams", _grams_expr(text_col, n))
        .select(
            "*",
            _fold_expr(wmap, F.col("_grams"), buckets, salt).alias(
                "dsir_logw_micro"
            ),
            F.size("_grams").alias("dsir_n_grams"),
        )
        .drop("_grams")
    )


def fit_and_score(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    n: int = _DEFAULT_N,
    buckets: int = _DEFAULT_BUCKETS,
    salt: str = _DEFAULT_SALT,
    alpha: float = 1.0,
) -> DataFrame:
    """One-call fit→score: histogram both corpora, build the weight
    table, score every raw document.  Two aggregations + one
    driver-sized collect + one narrow pass."""
    t_hist = bucket_histogram(target_df, text_col, n, buckets, salt)
    r_hist = bucket_histogram(raw_df, text_col, n, buckets, salt)
    w = importance_weights(t_hist, r_hist, buckets, alpha)
    return dsir_scores(raw_df, w, text_col, n, buckets, salt)


def select_by_weight(
    scored: DataFrame, min_weight_micro: int = 0,
) -> DataFrame:
    """Deterministic selection: keep documents whose integer
    micro-unit log-weight clears the threshold (default 0 = "more
    target-like than raw-average").  An integer compare — exactly
    reproducible on any engine, hence driver-verifiable."""
    return scored.filter(F.col("dsir_logw_micro") >= int(min_weight_micro))


def gumbel_topk(
    scored: DataFrame, k: int, id_col: str = "doc_id",
    temperature: float = 1.0, salt: str = "gumbel",
) -> DataFrame:
    """The paper's importance RESAMPLING: top-``k`` by
    ``logw/T + Gumbel noise``, the standard exponential-race trick
    that draws k documents without replacement with probability
    proportional to ``exp(logw/T)``.

    Deterministic: the Gumbel variate is derived from the md5 bucket
    of the doc id (``u = (bucket + 0.5) / 1e6``, ``g = −ln(−ln u)``),
    so the same (corpus, salt) always draws the same sample.  The
    ordering key passes through float ``log``/division, so rank
    boundaries are not engine-reproducible — pytest-pinned, stated
    (the ``temperature_mix`` precedent).

    The top-k itself is one ``orderBy().limit(k)`` — Spark plans it
    as TakeOrderedAndProject (per-partition heaps + driver merge of
    k·partitions rows), no full sort, no full shuffle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    h = F.md5(
        F.concat(
            F.coalesce(F.col(id_col).cast("string"), F.lit("<null>")),
            F.lit(salt),
        )
    )
    u = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _MICRO + 0.5
    ) / _MICRO
    key = (
        F.col("dsir_logw_micro").cast("double")
        / _MICRO
        / float(temperature)
        - F.log(-F.log(u))
    )
    return (
        scored.withColumn("_gumbel_key", key)
        .orderBy(F.col("_gumbel_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_gumbel_key")
    )
