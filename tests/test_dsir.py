"""DSIR hashed n-gram importance resampling (operators/dsir.py).

The battery slot (ta_quality_classifier's dsir columns) pins the fit
against the DuckDB restatement; these tests pin the operator against
a pure-Python reference implementation, the selection modes, the
contract errors, and the scale-critical plan shape (the scoring pass
must stay shuffle-free)."""

from __future__ import annotations

import contextlib
import hashlib
import io
import math
import re

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.operators import dsir

N, B, SALT, ALPHA = 2, 64, "t", 1.0


def _norm_words(text):
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")


def _grams(text, n=N):
    ws = _norm_words(text)
    if len(ws) < n:
        return [" ".join(ws)]
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


def _bucket(g, buckets=B, salt=SALT):
    h = hashlib.md5((g + salt).encode()).hexdigest()
    return int(h[:8], 16) % buckets


def _py_scores(raw, target, buckets=B, salt=SALT, alpha=ALPHA):
    """The reference fit: histograms, add-alpha log ratio, micro-unit
    quantization, integer per-doc sum."""
    th, rh = {}, {}
    for _i, t in target:
        for g in _grams(t):
            th[_bucket(g, buckets, salt)] = th.get(_bucket(g, buckets, salt), 0) + 1
    for _i, t in raw:
        for g in _grams(t):
            rh[_bucket(g, buckets, salt)] = rh.get(_bucket(g, buckets, salt), 0) + 1
    tt, rt = sum(th.values()), sum(rh.values())
    wm = {
        b: round(
            (
                math.log((th.get(b, 0) + alpha) / (tt + alpha * buckets))
                - math.log((rh.get(b, 0) + alpha) / (rt + alpha * buckets))
            )
            * 1e6
        )
        for b in set(th) | set(rh)
    }
    return {
        i: sum(wm.get(_bucket(g, buckets, salt), 0) for g in _grams(t))
        for i, t in raw
    }


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the mat"),
    (2, "a dog runs in the park every day"),
    (3, "Quantum flux capacitors invert the polarity of neutron flow!"),
    (4, "cat"),          # single word: whole-doc gram
    (5, ""),             # empty: one empty gram, must not crash
    (6, "the cat sat on a warm mat near the park"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_scores_match_python_reference(spark, corpus_df):
    target = [CORPUS[0], CORPUS[4]]
    expect = _py_scores(CORPUS, target)
    scored = dsir.fit_and_score(
        corpus_df, corpus_df.filter("doc_id IN (0, 4)"),
        n=N, buckets=B, salt=SALT, alpha=ALPHA,
    )
    got = {r["doc_id"]: r["dsir_logw_micro"] for r in scored.collect()}
    assert got == expect


def test_scores_match_python_reference_on_real_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    target = [r for r in rows if r[0] < 25]
    expect = _py_scores(rows, target, buckets=512, salt="dsir")
    scored = dsir.fit_and_score(
        docs, docs.filter("doc_id < 25"), n=N, buckets=512, salt="dsir"
    )
    got = {r["doc_id"]: r["dsir_logw_micro"] for r in scored.collect()}
    assert got == expect


def test_identical_corpora_score_zero(spark, corpus_df):
    scored = dsir.fit_and_score(corpus_df, corpus_df, n=N, buckets=B)
    assert all(r["dsir_logw_micro"] == 0 for r in scored.collect())


def test_target_lookalike_outranks_unrelated(spark, corpus_df):
    # replicate the target doc so the target histogram dominates the
    # add-alpha smoothing (with one 5-gram doc against 64 buckets the
    # smoothing floor owns every weight and ordering is noise — the
    # score is a LOG-LIKELIHOOD-RATIO SUM, so it only separates
    # corpora the target distribution actually describes)
    target = spark.createDataFrame([CORPUS[0]] * 20, "doc_id long, text string")
    scored = dsir.fit_and_score(corpus_df, target, n=N, buckets=B)
    got = {r["doc_id"]: r["dsir_logw_micro"] for r in scored.collect()}
    # identical docs score identically
    assert got[0] == got[1]
    # the exact copy of the target beats the vocabulary-disjoint doc,
    # and the partial-overlap doc sits strictly between
    assert got[1] > got[6] > got[3]


def test_gram_counts_and_short_doc_rule(spark, corpus_df):
    scored = dsir.fit_and_score(corpus_df, corpus_df.filter("doc_id = 0"))
    got = {r["doc_id"]: r["dsir_n_grams"] for r in scored.collect()}
    assert got[0] == 5          # 6 words -> 5 bigrams
    assert got[4] == 1          # single word -> whole-doc gram
    assert got[5] == 1          # empty text -> one (empty) gram


def test_select_by_weight_is_integer_threshold(spark, corpus_df):
    scored = dsir.fit_and_score(
        corpus_df, corpus_df.filter("doc_id IN (0, 4)"), n=N, buckets=B
    )
    rows = {r["doc_id"]: r["dsir_logw_micro"] for r in scored.collect()}
    kept = {
        r["doc_id"] for r in dsir.select_by_weight(scored, 0).collect()
    }
    assert kept == {i for i, w in rows.items() if w >= 0}
    hi = max(rows.values())
    kept_hi = {
        r["doc_id"]
        for r in dsir.select_by_weight(scored, hi).collect()
    }
    assert kept_hi == {i for i, w in rows.items() if w == hi}


def test_gumbel_topk_deterministic_and_biased(spark, corpus_df):
    # strong target (see test_target_lookalike_outranks_unrelated):
    # docs 0/1 carry the top scores, doc 3 the bottom
    target = spark.createDataFrame([CORPUS[0]] * 20, "doc_id long, text string")
    scored = dsir.fit_and_score(corpus_df, target, n=N, buckets=B).cache()
    try:
        a = {r["doc_id"] for r in dsir.gumbel_topk(scored, 3).collect()}
        b = {r["doc_id"] for r in dsir.gumbel_topk(scored, 3).collect()}
        assert a == b and len(a) == 3
        assert "_gumbel_key" not in dsir.gumbel_topk(scored, 3).columns
        # k >= corpus: everything comes back
        assert dsir.gumbel_topk(scored, 100).count() == len(CORPUS)
        # bias: across many independent draws of 1, high-weight docs
        # (0/1, the target copies) win far more often than doc 3
        wins = {}
        for s in range(30):
            (i,) = [
                r["doc_id"]
                for r in dsir.gumbel_topk(
                    scored, 1, salt=f"s{s}", temperature=0.05
                ).collect()
            ]
            wins[i] = wins.get(i, 0) + 1
        assert wins.get(0, 0) + wins.get(1, 0) > wins.get(3, 0)
    finally:
        scored.unpersist()


def test_null_text_contributes_nothing_and_scores_null(spark, corpus_df):
    """r11 review fix: a NULL-text row (an input the content
    classifier explicitly supports) must not crash the fit with a
    NULL bucket; it scores NULL so threshold gates drop it."""
    withnull = corpus_df.union(
        spark.createDataFrame([(99, None)], "doc_id long, text string")
    )
    clean_hist = {
        r["bucket"]: r["cnt"]
        for r in dsir.bucket_histogram(corpus_df, buckets=B, salt=SALT).collect()
    }
    null_hist = {
        r["bucket"]: r["cnt"]
        for r in dsir.bucket_histogram(withnull, buckets=B, salt=SALT).collect()
    }
    assert null_hist == clean_hist  # the NULL row contributed nothing

    scored = dsir.fit_and_score(
        withnull, withnull.filter("doc_id = 0"), n=N, buckets=B, salt=SALT
    )
    rows = {r["doc_id"]: r["dsir_logw_micro"] for r in scored.collect()}
    assert rows[99] is None
    assert all(v is not None for i, v in rows.items() if i != 99)
    kept = {r["doc_id"] for r in dsir.select_by_weight(scored, -10**15).collect()}
    assert 99 not in kept and kept == set(rows) - {99}


def test_weight_table_is_total_and_prices_novel_vocabulary(spark, corpus_df):
    """r11 review fix: importance_weights emits ALL buckets, so in
    the pre-fitted mode a later corpus with novel vocabulary scores
    the add-alpha smoothing weight — not a silent 0."""
    import math as m

    target = corpus_df.filter("doc_id = 0")
    h_t = dsir.bucket_histogram(target, buckets=B, salt=SALT)
    h_r = dsir.bucket_histogram(corpus_df, buckets=B, salt=SALT)
    w = dsir.importance_weights(h_t, h_r, B)
    rows = {r["bucket"]: r["weight_micro"] for r in w.collect()}
    assert set(rows) == set(range(B))  # total over [0, B)

    t_tot = sum(r["cnt"] for r in h_t.collect())
    r_tot = sum(r["cnt"] for r in h_r.collect())
    unseen = round(
        (m.log(1.0 / (t_tot + B)) - m.log(1.0 / (r_tot + B))) * 1e6
    )
    seen = {r["bucket"] for r in h_t.collect()} | {
        r["bucket"] for r in h_r.collect()
    }
    for b in set(range(B)) - seen:
        assert rows[b] == unseen
    assert unseen > 0  # raw >> target here: novel vocab prices HIGH

    # a document with novel vocabulary scores the sum of its gram
    # buckets' weights from the TOTAL table (at B=64 some of its
    # buckets may collide with seen ones — the reference sum prices
    # each through the same table, so the check is collision-proof)
    text = "zzyyxx wwvvuu ttssrr"
    novel = spark.createDataFrame([(50, text)], "doc_id long, text string")
    got = dsir.dsir_scores(novel, w, n=N, buckets=B, salt=SALT).collect()[0]
    assert got["dsir_logw_micro"] == sum(
        rows[_bucket(g)] for g in _grams(text)
    )
    # and at least one of those buckets must exist in the table even
    # if unseen during the fit — the pre-r11 table would KeyError
    assert all(_bucket(g) in rows for g in _grams(text))


def test_prefitted_gate_validates_n_alpha_and_bucket_length(
    spark, corpus_df,
):
    """r11 review fixes: the pre-fitted paths validate n (they skip
    bucket_histogram's check), reject the fit-only alpha knob, reject
    unused dsir_opts, re-check the PrebuiltWeights artifact's bucket
    count against dsir_opts in pure Python, and reject raw Columns
    outright (they cannot be validated at all)."""
    from wikiextractor_spark.operators.corpus import prepare_corpus

    h = dsir.bucket_histogram(corpus_df, buckets=B, salt=SALT)
    w = dsir.importance_weights(h, h, B)
    with pytest.raises(ValueError, match="n >= 1"):
        dsir.parse_gate_opts({"n": 0})
    with pytest.raises(ValueError, match="n >= 1"):
        prepare_corpus(
            corpus_df, dedup=None, dsir_weights=w,
            min_dsir_weight_micro=0, dsir_opts={"n": 0, "buckets": B},
        )
    with pytest.raises(ValueError, match="alpha.*only affects the fit"):
        prepare_corpus(
            corpus_df, dedup=None, dsir_weights=w,
            min_dsir_weight_micro=0,
            dsir_opts={"alpha": 0.1, "buckets": B},
        )
    with pytest.raises(ValueError, match="unused"):
        prepare_corpus(corpus_df, dedup=None, dsir_opts={"buckets": B})
    wmap = dsir.weight_map_column(w, B)
    assert isinstance(wmap, dsir.PrebuiltWeights) and wmap.buckets == B
    with pytest.raises(ValueError, match="mismatch"):
        prepare_corpus(
            corpus_df, dedup=None, dsir_weights=wmap,
            min_dsir_weight_micro=0,
            dsir_opts={"buckets": B * 2, "salt": SALT},
        )
    # a raw Column cannot be validated at all — rejected outright
    with pytest.raises(TypeError, match="PrebuiltWeights"):
        prepare_corpus(
            corpus_df, dedup=None, dsir_weights=wmap.col,
            min_dsir_weight_micro=0, dsir_opts={"buckets": B},
        )
    # and the happy path through the validated artifact still gates
    kept = prepare_corpus(
        corpus_df, dedup=None, dsir_weights=wmap,
        min_dsir_weight_micro=0, dsir_opts={"buckets": B, "salt": SALT},
    )
    assert kept.count() == len(CORPUS)  # identical corpora: all score 0


def test_stream_dsir_contract_fails_at_definition(spark, tmp_path):
    """r11 review fix: DSIR contract errors surface at stream
    DEFINITION (like the url_blocklist schema check), not inside the
    first micro-batch."""
    from wikiextractor_spark.streaming import prepare_corpus_stream

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    h = dsir.bucket_histogram(docs, buckets=B, salt=SALT)
    w = dsir.importance_weights(h, h, B)
    args = (
        spark, str(tmp_path / "in"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), str(tmp_path / "state"),
    )
    with pytest.raises(ValueError, match="go together"):
        prepare_corpus_stream(*args, dsir_weights=w)
    with pytest.raises(ValueError, match="go together"):
        prepare_corpus_stream(*args, min_dsir_weight_micro=0)
    with pytest.raises(ValueError, match="unknown dsir_opts"):
        prepare_corpus_stream(
            *args, dsir_weights=w, min_dsir_weight_micro=0,
            dsir_opts={"bukets": 8},
        )
    with pytest.raises(ValueError, match="unused"):
        prepare_corpus_stream(*args, dsir_opts={"buckets": B})
    with pytest.raises(ValueError, match="alpha.*only affects the fit"):
        prepare_corpus_stream(
            *args, dsir_weights=w, min_dsir_weight_micro=0,
            dsir_opts={"alpha": 0.5, "buckets": B},
        )


def test_contract_errors(spark, corpus_df):
    with pytest.raises(ValueError, match="buckets"):
        dsir.bucket_histogram(corpus_df, buckets=0)
    with pytest.raises(ValueError, match="buckets"):
        dsir.bucket_histogram(corpus_df, buckets=dsir.MAX_BUCKETS + 1)
    with pytest.raises(ValueError, match="n >= 1"):
        dsir.bucket_histogram(corpus_df, n=0)
    h = dsir.bucket_histogram(corpus_df, buckets=B, salt=SALT)
    with pytest.raises(ValueError, match="alpha"):
        dsir.importance_weights(h, h, B, alpha=0.0)
    w = dsir.importance_weights(h, h, B)
    with pytest.raises(ValueError, match="empty"):
        dsir.dsir_scores(corpus_df, w.filter("bucket < -1"), buckets=B)
    with pytest.raises(ValueError, match="not total"):
        dsir.dsir_scores(corpus_df, w.filter("bucket <> 3"), buckets=B)
    with pytest.raises(ValueError, match="outside"):
        dsir.dsir_scores(corpus_df, w, buckets=B // 2)
    scored = dsir.fit_and_score(corpus_df, corpus_df, buckets=B)
    with pytest.raises(ValueError, match="k must"):
        dsir.gumbel_topk(scored, 0)
    with pytest.raises(ValueError, match="temperature"):
        dsir.gumbel_topk(scored, 1, temperature=0.0)


def test_prepare_corpus_dsir_gate(spark, corpus_df):
    """The composition: the gate keeps exactly the docs
    select_by_weight keeps over the same fit, in both the fit-here
    (dsir_target) and pre-fitted (dsir_weights) modes."""
    from wikiextractor_spark.operators.corpus import prepare_corpus

    target = spark.createDataFrame([CORPUS[0]] * 20, "doc_id long, text string")
    opts = {"n": N, "buckets": B, "salt": SALT}
    scored = dsir.fit_and_score(corpus_df, target, **opts)
    thresh = 0
    expect = {
        r["doc_id"] for r in dsir.select_by_weight(scored, thresh).collect()
    }
    assert 0 < len(expect) < len(CORPUS)  # the gate is selective here

    kept_fit = prepare_corpus(
        corpus_df, dedup=None,
        dsir_target=target, min_dsir_weight_micro=thresh, dsir_opts=opts,
    )
    assert {r["doc_id"] for r in kept_fit.collect()} == expect

    h_t = dsir.bucket_histogram(target, "text", **opts)
    h_r = dsir.bucket_histogram(corpus_df.select("text"), "text", **opts)
    w = dsir.importance_weights(h_t, h_r, B)
    kept_pre = prepare_corpus(
        corpus_df, dedup=None,
        dsir_weights=w, min_dsir_weight_micro=thresh, dsir_opts=opts,
    )
    assert {r["doc_id"] for r in kept_pre.collect()} == expect

    # the gate composes with a downstream stage (chunking) in one plan
    chunks = prepare_corpus(
        corpus_df, dedup=None,
        dsir_target=target, min_dsir_weight_micro=thresh, dsir_opts=opts,
        chunk_tokens=4, overlap=1,
    )
    assert {r["doc_id"] for r in chunks.collect()} == expect


def test_prepare_corpus_dsir_contract(spark, corpus_df):
    from wikiextractor_spark.operators.corpus import prepare_corpus

    target = corpus_df.filter("doc_id = 0")
    h = dsir.bucket_histogram(corpus_df, buckets=B, salt=SALT)
    w = dsir.importance_weights(h, h, B)
    with pytest.raises(ValueError, match="not both"):
        prepare_corpus(
            corpus_df, dedup=None, dsir_target=target, dsir_weights=w,
            min_dsir_weight_micro=0,
        )
    with pytest.raises(ValueError, match="go"):
        prepare_corpus(corpus_df, dedup=None, dsir_target=target)
    with pytest.raises(ValueError, match="go"):
        prepare_corpus(corpus_df, dedup=None, min_dsir_weight_micro=0)
    with pytest.raises(ValueError, match="unknown dsir_opts"):
        prepare_corpus(
            corpus_df, dedup=None, dsir_target=target,
            min_dsir_weight_micro=0, dsir_opts={"bukets": 8},
        )


def test_scoring_pass_is_shuffle_free(spark, corpus_df):
    """The scale-critical property: once the weight table exists, the
    scoring pass over the 100 TB side is one narrow projection — no
    Exchange, no join, no Python."""
    h = dsir.bucket_histogram(corpus_df, buckets=B, salt=SALT)
    w = dsir.importance_weights(h, h, B)
    scored = dsir.dsir_scores(corpus_df, w, buckets=B, salt=SALT)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
