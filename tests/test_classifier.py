"""Trained quality classifier: fit separation, native-only scoring
plan, model portability, gating, and edge cases."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.functions import classifier as clf


STOP = "the of and in to a is was for on as by with at from".split()
WORDS = (
    "system history village player music government science river "
    "language record water between united people century company "
    "school north american national following second world war army "
    "built known major early region state small large"
).split()


def _good_doc(rng):
    n = rng.randint(40, 160)
    out = []
    for _ in range(n):
        out.append(rng.choice(STOP) if rng.random() < 0.4 else rng.choice(WORDS))
        if rng.random() < 0.08:
            out[-1] += "."
    return " ".join(out)


def _bad_doc(rng):
    kind = rng.randrange(4)
    if kind == 0:  # punctuation/symbol noise
        return " ".join(
            "".join(rng.choice("!@#$%^&*()[]{};:<>|\\/~`+=-_") for _ in range(rng.randint(3, 9)))
            for _ in range(rng.randint(10, 60))
        )
    if kind == 1:  # digit dumps
        return " ".join(str(rng.randrange(10**6)) for _ in range(rng.randint(15, 80)))
    if kind == 2:  # ALLCAPS gibberish
        return " ".join(
            "".join(rng.choice("BCDFGHJKLMNPQRSTVWXZ") for _ in range(rng.randint(4, 11)))
            for _ in range(rng.randint(10, 60))
        )
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 4)))


@pytest.fixture(scope="module")
def labeled(spark):
    rng = random.Random(7)
    rows = [(i, _good_doc(rng), 1) for i in range(200)] + [
        (1000 + i, _bad_doc(rng), 0) for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_fit_separates_labeled_sample(labeled):
    m = clf.fit_quality_classifier(labeled, reg_param=0.1)
    assert all(math.isfinite(w) for w in m.weights)
    scored = clf.score_quality(labeled, m)
    acc = scored.select(
        F.avg(
            ((F.col("quality_logit") >= 0).cast("int") == F.col("label")).cast(
                "double"
            )
        )
    ).first()[0]
    assert acc >= 0.95
    # learned signs agree with the prior: stopwords up, noise down
    w = dict(zip(m.feature_names, m.weights))
    assert w["stopword_ratio"] > 0
    assert w["punct_ratio"] < 0 and w["digit_ratio"] < 0


def test_default_model_separates(labeled):
    """The frozen DEFAULT_MODEL (fit once from this exact generator,
    then rounded to 4 decimals) still separates a fresh sample."""
    scored = clf.score_quality(labeled, clf.DEFAULT_MODEL)
    acc = scored.select(
        F.avg(
            ((F.col("quality_logit") >= 0).cast("int") == F.col("label")).cast(
                "double"
            )
        )
    ).first()[0]
    assert acc >= 0.95


def test_scoring_plan_is_native_single_projection(labeled):
    scored = clf.score_quality(labeled, clf.DEFAULT_MODEL)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # no shuffle at inference


def test_gate_pushes_down_and_filters(labeled):
    gated = clf.gate_by_classifier(labeled, clf.DEFAULT_MODEL, threshold=0.0)
    kept = gated.select("label").groupBy("label").count().collect()
    by_label = {r["label"]: r["count"] for r in kept}
    assert by_label.get(1, 0) > by_label.get(0, 0)


def test_model_json_round_trip():
    m = clf.DEFAULT_MODEL
    m2 = clf.QualityModel.from_json(m.to_json())
    assert m2 == m


def test_model_validation():
    with pytest.raises(ValueError):
        clf.QualityModel(("length_band",), (1.0, 2.0), 0.0)
    with pytest.raises(ValueError):
        clf.QualityModel(("no_such_feature",), (1.0,), 0.0)


def test_empty_and_edge_text_score_finite(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, " "), (3, "a"), (4, "1234567890"), (5, "!!!")],
        "doc_id long, text string",
    )
    rows = clf.score_quality(df, clf.DEFAULT_MODEL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["quality_logit"] is not None
        assert math.isfinite(r["quality_logit"])


def test_threshold_from_quantile(labeled):
    thr = clf.classifier_threshold_from_quantile(labeled, 0.25)
    kept = clf.gate_by_classifier(labeled, threshold=thr).count()
    total = labeled.count()
    # approxQuantile with tight rel-error: keep fraction ~ 0.75
    assert 0.70 <= kept / total <= 0.80


def test_probability_is_sigmoid_of_logit(labeled):
    both = labeled.select(
        clf.logit_expr(clf.DEFAULT_MODEL).alias("z"),
        clf.probability_expr(clf.DEFAULT_MODEL).alias("p"),
    ).collect()
    for r in both:
        assert abs(r["p"] - 1.0 / (1.0 + math.exp(-r["z"]))) < 1e-12
        assert 0.0 <= r["p"] <= 1.0


def test_logit_sql_matches_spark_on_testdata(spark, sf_dir):
    """Engine parity of the oracle restatement on real documents —
    the exact check the driver battery runs, pinned locally."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = {
        r["doc_id"]: r["q"]
        for r in clf.score_quality(docs, clf.DEFAULT_MODEL)
        .select("doc_id", F.round("quality_logit", 6).alias("q"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    d = dict(
        con.execute(
            f"SELECT doc_id, round({clf.logit_sql(clf.DEFAULT_MODEL)}, 6) "
            "FROM documents"
        ).fetchall()
    )
    assert s == d


# ---------------- hashed n-gram (fastText-shape) classifier ----------------


def test_hashed_classifier_separates(labeled):
    """Content model alone: high but not perfect accuracy on the
    shared fixture — its 'tiny fragment' negatives are built FROM
    good-pool words, so they are shape-bad, not content-bad (the
    feature model's job).  Combining both models separates fully."""
    w, prior = clf.fit_hashed_classifier(labeled)
    scored = clf.score_hashed(labeled, w, prior)
    acc = scored.select(
        F.avg(
            ((F.col("content_logit") >= 0).cast("int") == F.col("label")).cast(
                "double"
            )
        )
    ).first()[0]
    assert acc >= 0.85
    # content + shape: every doc the content model passes but the
    # shape model rejects (the fragments) is caught by the AND gate
    both = scored.withColumn(
        "shape", clf.logit_expr(clf.DEFAULT_MODEL)
    )
    combined_acc = both.select(
        F.avg(
            (
                ((F.col("content_logit") >= 0) & (F.col("shape") >= 0)).cast(
                    "int"
                )
                == F.col("label")
            ).cast("double")
        )
    ).first()[0]
    assert combined_acc >= 0.97


def test_hashed_classifier_content_not_shape(spark):
    """Unlike the feature model, the hashed model separates docs with
    IDENTICAL shape statistics but different vocabulary — the content
    signal is what it adds."""
    good_words = "history village river school music people".split()
    bad_words = "viagra casino jackpot winner claim bonus".split()
    rows = [(i, " ".join(good_words[i % 3:] + good_words[: i % 3]), 1)
            for i in range(30)]
    rows += [(100 + i, " ".join(bad_words[i % 3:] + bad_words[: i % 3]), 0)
             for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, prior = clf.fit_hashed_classifier(df)
    got = {r["doc_id"]: r["content_logit"]
           for r in clf.score_hashed(df, w, prior).collect()}
    assert all(got[i] > 0 for i in range(30))
    assert all(got[100 + i] < 0 for i in range(30))


def test_hashed_classifier_empty_doc_scores_prior(spark):
    df = spark.createDataFrame(
        [(1, "good words here", 1), (2, "bad stuff there", 0)],
        "doc_id long, text string, label int",
    )
    w, prior = clf.fit_hashed_classifier(df)
    scored = clf.score_hashed(
        spark.createDataFrame([(9, "")], "doc_id long, text string"), w, prior
    )
    assert scored.first()["content_logit"] == pytest.approx(prior)


def test_hashed_classifier_null_text_scores_null(spark):
    """NULL text scores NULL (not `prior`): every other text gate
    drops NULL text, and a positive prior above the content-gate
    threshold must not let NULL-text docs through the one remaining
    gate (ADVICE r7)."""
    df = spark.createDataFrame(
        [(1, "good words here", 1), (2, "bad stuff there", 0)],
        "doc_id long, text string, label int",
    )
    w, prior = clf.fit_hashed_classifier(df)
    scored = clf.score_hashed(
        spark.createDataFrame([(9, None)], "doc_id long, text string"),
        w, prior,
    )
    assert scored.first()["content_logit"] is None


def test_hashed_classifier_unseen_tokens_score_prior(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", 1), (2, "delta epsilon zeta", 0)],
        "doc_id long, text string, label int",
    )
    w, prior = clf.fit_hashed_classifier(df, bigrams=False)
    scored = clf.score_hashed(
        spark.createDataFrame(
            [(9, "totally novel vocabulary")], "doc_id long, text string"
        ),
        w, prior, bigrams=False,
    )
    # unseen buckets are absent from the weight table -> contribute 0
    assert scored.first()["content_logit"] == pytest.approx(prior)


def test_hashed_classifier_single_class_raises(spark):
    df = spark.createDataFrame(
        [(1, "a b", 1), (2, "c d", 1)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError, match="both classes"):
        clf.fit_hashed_classifier(df)


def test_hashed_scoring_plan_broadcasts_weights(labeled):
    w, prior = clf.fit_hashed_classifier(labeled)
    plan = clf.score_hashed(labeled, w, prior)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hashed_classifier_deterministic(labeled):
    w1, p1 = clf.fit_hashed_classifier(labeled)
    w2, p2 = clf.fit_hashed_classifier(labeled)
    assert p1 == p2
    d1 = {r["bucket"]: r["weight"] for r in w1.collect()}
    d2 = {r["bucket"]: r["weight"] for r in w2.collect()}
    assert d1 == d2


def test_threshold_from_quantile_empty_input_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no scored rows"):
        clf.classifier_threshold_from_quantile(empty, 0.1)


def test_hashed_fit_is_materialized(labeled):
    """The returned weight table must not re-run the fit per action:
    its plan is a (checkpointed) scan, not the explode+groupBy."""
    w, _ = clf.fit_hashed_classifier(labeled)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan and "HashAggregate" not in plan


def test_hashed_weights_roundtrip_and_tsv(spark, tmp_path):
    """External-model adapter: export a fitted hashed-gram model,
    reload it, scores bit-identical; TSV import with an explicit
    prior; the floor/prior double-supply contract raises."""
    df = spark.createDataFrame(
        [(1, "good words here always", 1), (2, "bad spam stuff there", 0),
         (3, "more good words here", 1), (4, "spam bad junk", 0)],
        "doc_id long, text string, label int",
    )
    w, prior = clf.fit_hashed_classifier(df)
    path = str(tmp_path / "weights.parquet")
    clf.save_hashed_weights(w, prior, path)
    w2, prior2 = clf.load_hashed_weights(spark, path)
    assert prior2 == prior
    before = {r["doc_id"]: r["content_logit"]
              for r in clf.score_hashed(df, w, prior).collect()}
    after = {r["doc_id"]: r["content_logit"]
             for r in clf.score_hashed(df, w2, prior2).collect()}
    assert before == after  # bit-identical round trip

    # TSV import (fastText-style two-column dump)
    rows = w.collect()
    tsv = tmp_path / "weights.tsv"
    tsv.write_text(
        "".join(f"{r['bucket']}\t{r['weight']}\n" for r in rows)
    )
    w3, prior3 = clf.load_hashed_weights(spark, str(tsv), prior=prior)
    after3 = {r["doc_id"]: r["content_logit"]
              for r in clf.score_hashed(df, w3, prior3).collect()}
    assert before == after3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="prior"):
        clf.load_hashed_weights(spark, path, prior=0.5)  # double prior
    with _pytest.raises(ValueError, match="prior"):
        clf.load_hashed_weights(spark, str(tsv))  # missing prior


def test_hashed_weights_malformed_artifacts_raise(spark, tmp_path):
    """Review findings r8: a bucket value the long cast cannot
    represent must RAISE — not be silently dropped (TSV) or promoted
    to the prior row (string-typed parquet)."""
    import pytest as _pytest

    # string-typed parquet with one non-numeric bucket
    bad_pq = str(tmp_path / "badbucket.parquet")
    spark.createDataFrame(
        [("12", 0.5), ("oops", 0.1)], "bucket string, weight double"
    ).coalesce(1).write.parquet(bad_pq)
    with _pytest.raises(ValueError, match="cannot be read as long"):
        clf.load_hashed_weights(spark, bad_pq, prior=0.0)

    # TSV with a corrupt bucket field: must raise, not drop the row
    tsv = tmp_path / "corrupt.tsv"
    tsv.write_text("12\t0.5\nnot_a_bucket\t0.1\n")
    with _pytest.raises(ValueError, match="cannot be read as long"):
        clf.load_hashed_weights(spark, str(tsv), prior=0.0)

    # TSV with a non-numeric weight
    tsv2 = tmp_path / "badweight.tsv"
    tsv2.write_text("12\tNaW\n")
    with _pytest.raises(ValueError, match="not numeric"):
        clf.load_hashed_weights(spark, str(tsv2), prior=0.0)

    # unknown fmt
    with _pytest.raises(ValueError, match="fmt"):
        clf.load_hashed_weights(spark, str(tsv), fmt="csv", prior=0.0)


def test_hashed_weights_missing_value_raises(spark, tmp_path):
    """Review finding r8: a keyed row with a MISSING value (TSV line
    with no tab, NULL parquet cell) must raise — it would otherwise
    load as a zero-weight bucket and silently shift every score."""
    import pytest as _pytest

    tsv = tmp_path / "missing.tsv"
    tsv.write_text("12\t0.5\n13\n")
    with _pytest.raises(ValueError, match="missing or not numeric"):
        clf.load_hashed_weights(spark, str(tsv), prior=0.0)

    null_pq = str(tmp_path / "nullweight.parquet")
    spark.createDataFrame(
        [(12, 0.5), (13, None)], "bucket bigint, weight double"
    ).coalesce(1).write.parquet(null_pq)
    with _pytest.raises(ValueError, match="missing or not numeric"):
        clf.load_hashed_weights(spark, null_pq, prior=0.0)


def test_hashed_weights_tsv_empty_key_and_quotes(spark, tmp_path):
    """Review findings r8: a TSV line with an empty key field is
    corrupt (a TSV cannot carry the prior row) — raise, never consume
    it as the prior; and keys containing double quotes load verbatim
    (csv quote handling disabled)."""
    import pytest as _pytest

    bad = tmp_path / "emptykey.tsv"
    bad.write_text("12\t0.5\n\t-2.0\n")
    with _pytest.raises(ValueError, match="cannot carry the prior"):
        clf.load_hashed_weights(spark, str(bad), prior=0.0)
    with _pytest.raises(ValueError, match="cannot carry the prior"):
        clf.load_hashed_weights(spark, str(bad))

    # quoted-looking LM tokens load verbatim through the shared
    # helper (string key type)
    from wikiextractor_spark.functions import lmquality as lmq

    tsv = tmp_path / "quoted.tsv"
    tsv.write_text('"foo"\t-3.2\n"bar\t-4.0\nplain\t-1.0\n')
    lm = lmq.load_logprob_table(spark, str(tsv), floor_logp=-9.0)
    toks = {r["token"] for r in lm.collect() if r["token"] is not None}
    assert toks == {'"foo"', '"bar', "plain"}


def test_hashed_weights_fractional_key_raises(spark, tmp_path):
    """ADVICE r9: try_cast('long') of a float-typed parquet bucket
    TRUNCATES (3.7 → 3) instead of producing the NULL the bad-key
    count catches — a fractional key must RAISE (silent key rewrite
    contradicts the module's refuse-to-guess contract), while
    integral-valued doubles (3.0) still load exactly."""
    import pytest as _pytest

    frac = str(tmp_path / "frac.parquet")
    spark.createDataFrame(
        [(12.0, 0.5), (3.7, 0.1)], "bucket double, weight double"
    ).coalesce(1).write.parquet(frac)
    with _pytest.raises(ValueError, match="fractional"):
        clf.load_hashed_weights(spark, frac, prior=0.0)

    ok = str(tmp_path / "intdoubles.parquet")
    spark.createDataFrame(
        [(12.0, 0.5), (3.0, 0.1)], "bucket double, weight double"
    ).coalesce(1).write.parquet(ok)
    w, prior = clf.load_hashed_weights(spark, ok, prior=0.25)
    assert {(r["bucket"], r["weight"]) for r in w.collect()} == {
        (12, 0.5), (3, 0.1)
    }
    assert prior == 0.25
