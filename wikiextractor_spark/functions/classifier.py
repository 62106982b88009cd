"""Trained document-quality classifier (CCNet-style model filtering).

The reference pipeline (`/root/reference/WikiExtractor.py`) filters
only by structural heuristics; production training-data pipelines
(CCNet, fastText quality filters) add a TRAINED classifier: fit a
small linear model on a labeled sample ("wiki-like" vs "raw crawl"),
then score every document and keep the high scorers.

Spark-first split of labor, designed for the 100 TB asymmetry
between fitting and scoring:

- **FIT** runs on the labeled sample (thousands to a few million
  rows) through ``pyspark.ml`` LogisticRegression — the L-BFGS
  gradient passes are distributed ``treeAggregate``s, and the only
  thing that ever reaches the driver is the coefficient vector.
- **SCORE** is pure native column arithmetic: the fitted model is a
  driver-sized list of ``(feature, weight)`` floats inlined as
  literals into ONE codegen projection.  No UDF, no MLlib, no
  shuffle at inference — scoring 100 TB is a scan-speed map.

Every feature is defined TWICE — a PySpark ``Column`` and a DuckDB
SQL fragment with the identical operation order — so a fixed-weight
scoring pass is exactly restatable as ANSI SQL (the driver-oracle
battery uses this).  The linear score exposed for gating is the raw
LOGIT (monotone in the probability), which keeps the oracle free of
``exp()`` and therefore bit-stable across libm implementations;
``probability_expr`` applies the sigmoid when a calibrated [0, 1]
score is wanted Python-side.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wikiextractor_spark.functions import textstats

# --------------------------------------------------------------------------
# Feature registry: name -> (native Column factory, DuckDB SQL factory).
#
# Rules that keep the two engines bit-identical:
#  - every ratio multiplies by 1.0 BEFORE dividing (the repo-wide
#    convention mirrored by all green oracle slots);
#  - denominators are wrapped in greatest(..., 1) so empty text
#    yields finite features instead of NULL/divide-by-zero;
#  - no exp/log/trig — plain +, *, /, least/greatest only.
# --------------------------------------------------------------------------


def _f_length_band(t: str) -> Column:
    return F.least(F.length(F.col(t)) / F.lit(500.0), F.lit(1.0))


def _d_length_band(t: str) -> str:
    return f"least(length({t}) / 500.0, 1.0)"


def _f_stopword_ratio(t: str) -> Column:
    # the hit count is textstats' own expression, so the classifier
    # feature can never diverge from the lang-ID definition
    return textstats._hits_expr(t, "en") * F.lit(1.0) / F.size(
        F.split(F.col(t), " ")
    )


def _d_stopword_ratio(t: str) -> str:
    stop_lits = ", ".join("'%s'" % w for w in textstats.STOPWORDS["en"])
    return (
        f"len(list_filter(string_split({t}, ' '), w -> list_contains([{stop_lits}], w)))"
        f" * 1.0 / len(string_split({t}, ' '))"
    )


def _f_punct_ratio(t: str) -> Column:
    c = F.col(t)
    return (
        F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")) * F.lit(1.0)
        / F.greatest(F.length(c), F.lit(1))
    )


def _d_punct_ratio(t: str) -> str:
    return (
        f"length(regexp_replace({t}, '[A-Za-z0-9\\s]', '', 'g')) * 1.0"
        f" / greatest(length({t}), 1)"
    )


def _f_digit_ratio(t: str) -> Column:
    c = F.col(t)
    return (
        F.length(F.regexp_replace(c, r"[^0-9]", "")) * F.lit(1.0)
        / F.greatest(F.length(c), F.lit(1))
    )


def _d_digit_ratio(t: str) -> str:
    return (
        f"length(regexp_replace({t}, '[^0-9]', '', 'g')) * 1.0"
        f" / greatest(length({t}), 1)"
    )


def _f_caps_ratio(t: str) -> Column:
    c = F.col(t)
    return (
        F.length(F.regexp_replace(c, r"[^A-Z]", "")) * F.lit(1.0)
        / F.greatest(F.length(c), F.lit(1))
    )


def _d_caps_ratio(t: str) -> str:
    return (
        f"length(regexp_replace({t}, '[^A-Z]', '', 'g')) * 1.0"
        f" / greatest(length({t}), 1)"
    )


def _f_mean_word_len(t: str) -> Column:
    c = F.col(t)
    return (
        F.length(F.replace(c, F.lit(" "), F.lit(""))) * F.lit(1.0)
        / F.size(F.split(c, " "))
    )


def _d_mean_word_len(t: str) -> str:
    return (
        f"length(replace({t}, ' ', '')) * 1.0 / len(string_split({t}, ' '))"
    )


FEATURES: dict[str, tuple] = {
    "length_band": (_f_length_band, _d_length_band),
    "stopword_ratio": (_f_stopword_ratio, _d_stopword_ratio),
    "punct_ratio": (_f_punct_ratio, _d_punct_ratio),
    "digit_ratio": (_f_digit_ratio, _d_digit_ratio),
    "caps_ratio": (_f_caps_ratio, _d_caps_ratio),
    "mean_word_len": (_f_mean_word_len, _d_mean_word_len),
}

DEFAULT_FEATURES = tuple(FEATURES)


@dataclass(frozen=True)
class QualityModel:
    """A fitted linear quality model — driver-sized and JSON-portable.

    ``weights`` are on the ORIGINAL feature scale (pyspark.ml's
    ``standardization=True`` standardizes internally during
    optimization but reports coefficients back on the input scale),
    so scoring needs no mean/std bookkeeping.
    """

    feature_names: tuple[str, ...]
    weights: tuple[float, ...]
    intercept: float

    def __post_init__(self):
        if len(self.feature_names) != len(self.weights):
            raise ValueError(
                "feature_names and weights length mismatch: "
                f"{len(self.feature_names)} vs {len(self.weights)}"
            )
        unknown = [n for n in self.feature_names if n not in FEATURES]
        if unknown:
            raise ValueError(f"unknown features: {unknown}")

    def to_json(self) -> str:
        return json.dumps(
            {
                "feature_names": list(self.feature_names),
                "weights": list(self.weights),
                "intercept": self.intercept,
            }
        )

    @staticmethod
    def from_json(s: str) -> "QualityModel":
        d = json.loads(s)
        return QualityModel(
            tuple(d["feature_names"]), tuple(d["weights"]), float(d["intercept"])
        )


# Pretrained default: fit once (seeded, pyspark.ml L-BFGS,
# reg_param=0.1 so separable training data doesn't blow the weights
# up) on a synthetic wiki-like-vs-noise sample (the generator lives
# in tests/test_classifier.py::test_default_model_separates) and
# frozen to 4 decimals.  Rounding the published weights makes the
# literal inlined on both engines identical by construction.
# Positive evidence: stopword density, length; negative:
# punctuation/digit/caps noise, inflated word length.
DEFAULT_MODEL = QualityModel(
    feature_names=DEFAULT_FEATURES,
    weights=(1.8404, 9.4167, -1.3423, -1.5615, -0.9314, -0.5698),
    intercept=1.4095,
)


def feature_expr(name: str, text_col: str = "text") -> Column:
    """The named feature as a native Column (null-safe, no UDF)."""
    return FEATURES[name][0](text_col)


def feature_sql(name: str, text_col: str = "text") -> str:
    """The named feature as the bit-identical DuckDB fragment."""
    return FEATURES[name][1](text_col)


def logit_expr(model: QualityModel, text_col: str = "text") -> Column:
    """The model's linear score as ONE native expression.

    Accumulation order is fixed (intercept, then features in
    declaration order, left-associated) and mirrored exactly by
    :func:`logit_sql`, so a round() of either side hash-matches."""
    z = F.lit(model.intercept)
    for name, w in zip(model.feature_names, model.weights):
        z = z + F.lit(w) * feature_expr(name, text_col)
    return z


def logit_sql(model: QualityModel, text_col: str = "text") -> str:
    """DuckDB restatement of :func:`logit_expr`, same op order."""
    z = repr(model.intercept)
    for name, w in zip(model.feature_names, model.weights):
        z = f"({z} + {w!r} * ({feature_sql(name, text_col)}))"
    return z


def probability_expr(model: QualityModel, text_col: str = "text") -> Column:
    """Calibrated [0, 1] score (sigmoid of the logit).  Python-side
    convenience — the battery oracle sticks to the logit to stay
    libm-independent."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit_expr(model, text_col)))


def featurize(
    df: DataFrame,
    text_col: str = "text",
    features: tuple[str, ...] = DEFAULT_FEATURES,
) -> DataFrame:
    """Append one column per feature (names = feature names).  One
    narrow projection; the text column's split/regex subexpressions
    stay inside a single codegen stage."""
    return df.select(
        "*", *[feature_expr(n, text_col).alias(n) for n in features]
    )


def fit_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    features: tuple[str, ...] = DEFAULT_FEATURES,
    max_iter: int = 100,
    reg_param: float = 0.0,
) -> QualityModel:
    """Fit the linear quality model on a labeled sample.

    ``labeled`` needs ``text_col`` and a 0/1 ``label_col`` (1 =
    high-quality).  The fit is pyspark.ml LogisticRegression
    (distributed L-BFGS with internal standardization); only the
    coefficient vector crosses the driver.  At 100 TB the labeled
    sample is the small side by construction — label a few hundred
    thousand docs, fit here, then score the corpus with
    :func:`score_quality` at scan speed.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = featurize(
        labeled.select(F.col(label_col).cast("double").alias("label"), text_col),
        text_col,
        features,
    )
    assembled = VectorAssembler(
        inputCols=list(features), outputCol="features", handleInvalid="skip"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    m = lr.fit(assembled)
    weights = tuple(float(w) for w in m.coefficients.toArray())
    if not all(math.isfinite(w) for w in weights) or not math.isfinite(
        float(m.intercept)
    ):
        raise ValueError(
            "classifier fit produced non-finite weights — check for "
            "degenerate features or a single-class label column"
        )
    return QualityModel(tuple(features), weights, float(m.intercept))


def score_quality(
    df: DataFrame,
    model: QualityModel = DEFAULT_MODEL,
    text_col: str = "text",
    output_col: str = "quality_logit",
) -> DataFrame:
    """Append the model score (raw logit) as one native column.  The
    inference plan is a single projection — no UDF, no join, no
    shuffle; Catalyst folds the weight literals into codegen."""
    return df.withColumn(output_col, logit_expr(model, text_col))


def gate_by_classifier(
    df: DataFrame,
    model: QualityModel = DEFAULT_MODEL,
    threshold: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents the model scores at or above ``threshold``
    (logit scale; 0.0 = P(quality) >= 0.5).  Pure filter — pushes
    down to the scan like any other predicate."""
    return df.where(logit_expr(model, text_col) >= F.lit(threshold))


def classifier_threshold_from_quantile(
    df: DataFrame,
    q: float,
    model: QualityModel = DEFAULT_MODEL,
    text_col: str = "text",
    relative_error: float = 0.001,
) -> float:
    """Logit threshold that drops (approximately) the bottom ``q``
    fraction of ``df`` — "cut the worst 5%" without hand-picking a
    logit.  One approxQuantile pass (Greenwald-Khanna, driver gets
    one float)."""
    from wikiextractor_spark.functions.lmquality import (
        threshold_from_quantile_scores,
    )

    return threshold_from_quantile_scores(
        score_quality(df, model, text_col, "_q_logit"), q,
        score_col="_q_logit", relative_error=relative_error,
    )


# --------------------------------------------------------------------------
# Hashed n-gram classifier (fastText/CCNet shape).
#
# The interpretable-features model above captures document SHAPE;
# the standard CCNet filter also learns document CONTENT — a linear
# model over hashed word n-grams.  Here that is a Naive-Bayes
# log-odds fit: per hashed n-gram, w = log-odds of the gram under
# good vs bad, which is (a) a closed-form pure AGGREGATION (one
# explode + groupBy over the labeled sample — no iterative
# optimizer, fully distributed, deterministic), and (b) linear at
# inference exactly like fastText: score = prior + Σ w[h(gram)].
#
# Scale split: fit touches only the labeled sample; the weight table
# is ≤ num_buckets rows (2^18 default — a few MB), so inference over
# 100 TB is explode → BROADCAST join → one map-side-combined sum per
# doc.  No Python anywhere.
# --------------------------------------------------------------------------


def _hashed_grams(text_col: str, num_buckets: int, bigrams: bool) -> Column:
    """Lowercased word unigrams (+ optional bigrams), each hashed to
    a bucket via non-negative xxhash64 mod num_buckets.  One nested
    HOF expression, JVM-side; the token split is LET-BOUND via the
    ``transform(array(...), ts -> ...)[0]`` idiom the repo's other
    multi-reference expressions use, so it evaluates once per row
    instead of once per reference (3× with bigrams)."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t != '')"
    if bigrams:
        grams = (
            "concat(ts, transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
            " (t, i) -> concat(t, '_', element_at(ts, i + 2))))"
        )
    else:
        grams = "ts"
    return F.expr(
        f"transform(array({toks}), ts -> "
        f"transform({grams}, g -> pmod(xxhash64(g), {num_buckets}L)))[0]"
    )


def fit_hashed_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    num_buckets: int = 1 << 18,
    bigrams: bool = True,
    alpha: float = 1.0,
) -> tuple[DataFrame, float]:
    """→ ``(weights, prior)``: per-bucket log-odds weights and the
    class-prior intercept, fit on a 0/1-labeled sample (1 = good).

    ``w_b = log((n_good_b + α) / (N_good + α·B)) −
    log((n_bad_b + α) / (N_bad + α·B))`` with add-α smoothing, so
    unseen buckets contribute 0 by construction (they are simply
    absent from the table — the smoothing mass difference is folded
    into nothing rather than materializing B rows).  The prior is
    ``log(n_good_docs / n_bad_docs)``.

    The fit is ONE explode + groupBy(bucket) aggregate over the
    sample; the returned ``weights`` DataFrame has at most
    ``num_buckets`` rows (bounded, broadcastable).  Persist it with
    a plain parquet write to reuse across runs.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    lab = F.col(label_col).cast("int")
    base = labeled.select(
        lab.alias("_y"),
        _hashed_grams(text_col, num_buckets, bigrams).alias("_g"),
    )
    doc_counts = base.agg(
        F.sum("_y").alias("n_good"),
        F.sum(1 - F.col("_y")).alias("n_bad"),
    ).first()
    n_good_docs, n_bad_docs = doc_counts["n_good"], doc_counts["n_bad"]
    if not n_good_docs or not n_bad_docs:
        raise ValueError(
            "fit_hashed_classifier needs both classes present, got "
            f"good={n_good_docs} bad={n_bad_docs}"
        )
    # materialize the bucket counts: they feed BOTH the totals agg
    # and the weight projection (and the returned model is reused per
    # action / per micro-batch downstream), so the explode+groupBy
    # over the sample must run exactly once — the same contract
    # fit_unigram_lm states for its vocab table
    counts = (
        base.select("_y", F.explode("_g").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum("_y").alias("_ng"),
            F.sum(1 - F.col("_y")).alias("_nb"),
        )
        .localCheckpoint(eager=True)
    )
    # class gram totals: one tiny agg over the bucket table (already
    # shuffled and materialized), not a second corpus pass
    totals = counts.agg(
        F.sum("_ng").alias("tg"), F.sum("_nb").alias("tb")
    ).first()
    tg, tb = float(totals["tg"]), float(totals["tb"])
    b = float(num_buckets)
    weights = counts.select(
        "bucket",
        (
            F.log((F.col("_ng") + alpha) / F.lit(tg + alpha * b))
            - F.log((F.col("_nb") + alpha) / F.lit(tb + alpha * b))
        ).alias("weight"),
    )
    prior = math.log(n_good_docs / n_bad_docs)
    # weights is a narrow projection over the materialized counts, so
    # downstream re-use (per action, per micro-batch) never re-runs
    # the fit
    return weights, prior


def score_hashed(
    docs: DataFrame,
    weights: DataFrame,
    prior: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1 << 18,
    bigrams: bool = True,
    output_col: str = "content_logit",
) -> DataFrame:
    """Score documents under a fitted hashed-gram model: ``prior +
    Σ weight[h(gram)]`` per document, higher = more good-like.

    100 TB shape: the corpus explodes to gram grain ONCE, joins the
    broadcast weight table (bounded by num_buckets), and re-aggregates
    per document with map-side partial sums — one shuffle at
    document grain, no Python.  Docs with no grams (empty text)
    score exactly ``prior``; docs with NULL text score NULL — every
    other text gate here (Gopher, shape classifier, LM) drops NULL
    text, and a NULL-text doc sneaking through the content gate at
    ``prior`` would be the one inconsistent path.
    ``num_buckets``/``bigrams`` must match the fit (they define the
    hash space).
    """
    grams = docs.select(
        F.col(id_col), _hashed_grams(text_col, num_buckets, bigrams).alias("_g")
    )
    summed = (
        grams.select(id_col, F.explode_outer("_g").alias("bucket"))
        .join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            (F.coalesce(F.sum("weight"), F.lit(0.0)) + F.lit(prior)).alias(
                output_col
            )
        )
    )
    return docs.join(summed, id_col, "left").withColumn(
        output_col,
        F.when(
            F.col(text_col).isNull(), F.lit(None).cast("double")
        ).otherwise(F.col(output_col)),
    )


# --------------------------------------------------------------------------
# External-model adapters: bring-your-own hashed-gram weights
# --------------------------------------------------------------------------

def save_hashed_weights(
    weights: DataFrame, prior: float, path: str,
) -> None:
    """Persist a fitted hashed-gram model — the ``(weights, prior)``
    pair :func:`fit_hashed_classifier` returns — as one parquet file.
    The prior rides as a ``bucket = NULL`` row (the same
    carry-the-scalar-with-the-model shape as the LM's NULL-token
    floor), so the artifact is self-contained."""
    from wikiextractor_spark.localframe import local_rows_df

    prior_row = local_rows_df(
        weights.sparkSession,
        [(None, float(prior))], "bucket bigint, weight double"
    )
    from wikiextractor_spark.functions.modelio import write_one_file

    write_one_file(
        weights.select(F.col("bucket").cast("long"), "weight")
        .unionByName(prior_row),
        path,
    )


def load_hashed_weights(
    spark, path: str, fmt: str | None = None, prior: float | None = None,
) -> tuple[DataFrame, float]:
    """Load PRETRAINED per-bucket weights into :func:`score_hashed` —
    the fastText-style workflow where the content classifier was
    trained elsewhere (or exported by :func:`save_hashed_weights`)
    instead of corpus-fit here.  The scoring machinery is already
    model-agnostic (broadcast weight join + doc-grain sum); this is
    only the import surface.

    Formats: ``parquet`` (columns ``bucket bigint, weight double``,
    optionally a ``bucket = NULL`` prior row) or ``tsv`` (two
    tab-separated columns, no header); ``fmt=None`` infers tsv from a
    ``.tsv``/``.txt`` suffix.  A TSV cannot express the prior row, so
    pass ``prior=``; supplying both (or neither) raises, exactly like
    the LM loader's floor contract.  The caller must score with the
    same ``num_buckets``/``bigrams`` the weights were trained with —
    they define the hash space and cannot be recovered from the
    table.

    → ``(weights, prior)``, weights materialized (re-used per action
    and per micro-batch).

    Validation (shared with the LM loader via :mod:`modelio`, so the
    two contracts can never drift): a bucket value the long cast
    cannot represent RAISES instead of becoming NULL — silently
    dropping it would load a model with missing weights, and
    promoting it to the prior row would replace the intercept; the
    prior must be supplied exactly once."""
    from wikiextractor_spark.functions.modelio import load_keyed_table

    weights, prior = load_keyed_table(
        spark, path, fmt,
        key_col="bucket", key_type="long", value_col="weight",
        scalar_name="prior", scalar=prior,
        caller="load_hashed_weights",
    )
    return weights.localCheckpoint(eager=True), float(prior)
