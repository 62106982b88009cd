"""BM25 lexical retrieval (functions/bm25.py): pure-Python
differential on toy + real documents, ranking semantics, contract
errors, and the scale-critical plan shapes (shuffle-free scoring,
TakeOrderedAndProject top-k)."""

from __future__ import annotations

import contextlib
import io
import math
import re

import pytest

from wikiextractor_spark.functions.bm25 import (
    bm25_score_column,
    bm25_scores,
    bm25_topk,
    fit_bm25,
    fit_bm25_index,
)

K1, B = 1.2, 0.75


def _norm_words(text):
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")


def _half_away(x):
    # the engines' ROUND (half away from zero; values here are >= 0)
    # — Python's built-in round is half-to-even and would diverge at
    # an exact .5
    return math.floor(x + 0.5)


def _py_bm25(rows, terms, k1=K1, b=B):
    """Reference: same formula, same integerize-first quantization."""
    words = {i: _norm_words(t) for i, t in rows}
    n = len(rows)
    tot = sum(len(w) for w in words.values())
    out = {}
    for i, ws in words.items():
        dl = len(ws)
        s = 0
        for t in dict.fromkeys(terms):
            df_t = sum(1 for w in words.values() if t in w)
            idf = _half_away(
                math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5)) * 1e6
            )
            tf = float(ws.count(t))
            norm = (1.0 - b) + b * (float(dl) * n) / tot
            s += _half_away(idf * (tf * (k1 + 1.0)) / (tf + k1 * norm))
        out[i] = s
    return out


CORPUS = [
    (0, "hash join beats sort merge join for small tables"),
    (1, "the window function scans the stream in one batch"),
    (2, "hash hash hash everywhere"),
    (3, "a plain document with no query words at all"),
    (4, "join"),
]
TERMS = ["hash", "join", "merge"]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_scores_match_python_reference(spark, corpus_df):
    model = fit_bm25(corpus_df, TERMS, k1=K1, b=B)
    expect = _py_bm25(CORPUS, TERMS)
    got = {
        r["doc_id"]: r["bm25_micro"]
        for r in bm25_scores(corpus_df, model, TERMS).collect()
    }
    assert got == expect
    # df/idf artifacts match the reference construction too
    assert model.df == {
        t: sum(1 for _i, x in CORPUS if t in _norm_words(x)) for t in TERMS
    }


def test_scores_match_python_reference_on_real_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    terms = ["hash", "join", "window", "stream"]
    model = fit_bm25(docs, terms)
    expect = _py_bm25(rows, terms)
    got = {
        r["doc_id"]: r["bm25_micro"]
        for r in bm25_scores(docs, model, terms).collect()
    }
    assert got == expect


def test_ranking_semantics(spark, corpus_df):
    model = fit_bm25(corpus_df, TERMS)
    got = {
        r["doc_id"]: r["bm25_micro"]
        for r in bm25_scores(corpus_df, model, TERMS).collect()
    }
    # doc 0 matches all three terms: the top hit
    assert got[0] == max(got.values())
    # no query words → exactly zero
    assert got[3] == 0 and got[1] == 0
    # term saturation: doc 2's three 'hash' repeats can't beat doc
    # 0's three distinct terms
    assert got[2] < got[0]
    top = bm25_topk(corpus_df, model, TERMS, 2).collect()
    assert [r["doc_id"] for r in top] == [0, 2]


def test_subset_query_and_null_text(spark, corpus_df):
    withnull = corpus_df.union(
        corpus_df.sparkSession.createDataFrame(
            [(99, None)], "doc_id long, text string"
        )
    )
    model = fit_bm25(corpus_df, TERMS)  # fit on union of query terms
    got = {
        r["doc_id"]: r["bm25_micro"]
        for r in bm25_scores(withnull, model, ["join"]).collect()
    }
    assert got[99] is None  # NULL text scores NULL
    # scoring a SUBSET of the fitted terms is allowed and matches the
    # reference for that query
    expect = _py_bm25(CORPUS, ["join"])
    # note: reference df/idf must come from the FIT corpus, which
    # here equals CORPUS, so values agree
    assert {i: got[i] for i in expect} == expect


def test_contract_errors(spark, corpus_df):
    with pytest.raises(ValueError, match="at least one term"):
        fit_bm25(corpus_df, [])
    with pytest.raises(ValueError, match="MAX_FIT_TERMS"):
        fit_bm25(corpus_df, [f"t{i}" for i in range(2000)])
    with pytest.raises(ValueError, match="k1"):
        fit_bm25(corpus_df, TERMS, k1=0.0)
    with pytest.raises(ValueError, match="never match"):
        fit_bm25(corpus_df, ["Hash"])
    with pytest.raises(ValueError, match="never match"):
        fit_bm25(corpus_df, ["hash join"])
    with pytest.raises(ValueError, match="never match"):
        fit_bm25(corpus_df, [""])
    with pytest.raises(ValueError, match="non-NULL text"):
        fit_bm25(corpus_df.filter("doc_id < 0"), TERMS)
    model = fit_bm25(corpus_df, TERMS)
    with pytest.raises(ValueError, match="not in the fitted model"):
        bm25_score_column(model, ["unfitted"])
    with pytest.raises(ValueError, match="empty query"):
        bm25_score_column(model, [])
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(corpus_df, model, TERMS, 0)


def test_null_text_population(spark, corpus_df):
    """r11 ADVICE: NULL-text rows must be excluded from n_docs AND
    total_dl — the fitted population is the scorable corpus, so a fit
    over a corpus with NULL texts equals the fit over the non-NULL
    subset exactly."""
    withnull = corpus_df.union(
        spark.createDataFrame(
            [(98, None), (99, None)], "doc_id long, text string"
        )
    )
    clean = fit_bm25(corpus_df, TERMS)
    dirty = fit_bm25(withnull, TERMS)
    assert dirty == clean
    assert dirty.n_docs == len(CORPUS)


def test_topk_never_pads_nulls(spark, corpus_df):
    """r11 ADVICE: k exceeding the scorable document count must not
    surface NULL-scored rows."""
    withnull = corpus_df.union(
        spark.createDataFrame([(99, None)], "doc_id long, text string")
    )
    model = fit_bm25(corpus_df, TERMS)
    rows = bm25_topk(withnull, model, TERMS, 100).collect()
    assert len(rows) == len(CORPUS)
    assert all(r["bm25_micro"] is not None for r in rows)


def test_fit_index_matches_query_fit(spark, corpus_df):
    """The standing index and the query fit are the same model on the
    shared terms: identical corpus stats, df, idf — and therefore
    identical scores through the shared scoring path."""
    qfit = fit_bm25(corpus_df, TERMS, k1=K1, b=B)
    index = fit_bm25_index(corpus_df, k1=K1, b=B)
    assert (index.n_docs, index.total_dl) == (qfit.n_docs, qfit.total_dl)
    for t in TERMS:
        assert index.df[t] == qfit.df[t]
        assert index.idf_micro[t] == qfit.idf_micro[t]
    expect = _py_bm25(CORPUS, TERMS)
    got = {
        r["doc_id"]: r["bm25_micro"]
        for r in bm25_scores(corpus_df, index, TERMS).collect()
    }
    assert got == expect


def test_fit_index_vocab_and_min_df(spark, corpus_df):
    """The index vocabulary is exactly the corpus's distinct
    normalized words; min_df prunes the long tail; NULL texts are
    outside the population."""
    withnull = corpus_df.union(
        spark.createDataFrame([(99, None)], "doc_id long, text string")
    )
    index = fit_bm25_index(withnull)
    all_words = set()
    df_py: dict[str, int] = {}
    for _i, text in CORPUS:
        ws = set(_norm_words(text))
        all_words |= ws
        for w in ws:
            df_py[w] = df_py.get(w, 0) + 1
    assert set(index.df) == all_words
    assert index.df == df_py
    assert index.n_docs == len(CORPUS)
    assert index.total_dl == sum(len(_norm_words(t)) for _i, t in CORPUS)
    pruned = fit_bm25_index(withnull, min_df=2)
    assert set(pruned.df) == {w for w, d in df_py.items() if d >= 2}
    # corpus stats are population facts, not vocabulary facts
    assert (pruned.n_docs, pruned.total_dl) == (index.n_docs, index.total_dl)


def test_fit_index_contracts(spark, corpus_df):
    with pytest.raises(ValueError, match="max_terms"):
        fit_bm25_index(corpus_df, max_terms=3)
    with pytest.raises(ValueError, match="min_df"):
        fit_bm25_index(corpus_df, min_df=0)
    with pytest.raises(ValueError, match="k1"):
        fit_bm25_index(corpus_df, k1=-1.0)
    with pytest.raises(ValueError, match="non-NULL text"):
        fit_bm25_index(corpus_df.filter("doc_id < 0"))
    with pytest.raises(ValueError, match="non-NULL text"):
        fit_bm25_index(
            spark.createDataFrame([(1, None)], "doc_id long, text string")
        )
    # a min_df that empties the vocabulary is a valid (empty) index,
    # not an error — scoring against it raises per the shared contract
    empty = fit_bm25_index(corpus_df, min_df=100)
    assert empty.df == {} and empty.n_docs == len(CORPUS)
    with pytest.raises(ValueError, match="not in the fitted model"):
        bm25_score_column(empty, ["hash"])


def test_plan_shapes(spark, corpus_df):
    """Scoring is shuffle-free and Python-free; top-k plans as
    TakeOrderedAndProject, never a global Sort."""
    model = fit_bm25(corpus_df, TERMS)

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    p = plan_of(bm25_scores(corpus_df, model, TERMS))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the r11 review fix: the regex normalization binds ONCE per row
    # (one-element-array idiom), not once per query term
    assert p.count("regexp_replace") == 1
    pk = plan_of(bm25_topk(corpus_df, model, TERMS, 5))
    assert "TakeOrderedAndProject" in pk
    assert "Sort " not in pk


# --------------------------------------------------------------------------
# incremental index maintenance
# --------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from wikiextractor_spark.functions.bm25 import (  # noqa: E402
    update_bm25_index,
)


def _model_tuple(m):
    return (m.n_docs, m.total_dl, m.k1, m.b,
            dict(m.idf_micro), dict(m.df), m.complete)


def test_update_equals_refit(spark, corpus_df):
    """The maintenance law: update(fit(A), B) == fit(A ∪ B), every
    field, and sequential updates compose."""
    a = corpus_df.filter(F.col("doc_id") % 2 == 0)
    b = corpus_df.filter(F.col("doc_id") % 2 == 1)
    merged = update_bm25_index(
        fit_bm25_index(a, k1=K1, b=B), b
    )
    full = fit_bm25_index(corpus_df, k1=K1, b=B)
    assert _model_tuple(merged) == _model_tuple(full)
    # three-way sequential composition
    c1 = corpus_df.filter(F.col("doc_id") % 3 == 0)
    c2 = corpus_df.filter(F.col("doc_id") % 3 == 1)
    c3 = corpus_df.filter(F.col("doc_id") % 3 == 2)
    seq = update_bm25_index(
        update_bm25_index(fit_bm25_index(c1, k1=K1, b=B), c2), c3
    )
    assert _model_tuple(seq) == _model_tuple(full)


def test_update_equals_refit_on_real_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    merged = update_bm25_index(
        fit_bm25_index(docs.filter(F.col("doc_id") < 200)),
        docs.filter(F.col("doc_id") >= 200),
    )
    full = fit_bm25_index(docs)
    assert _model_tuple(merged) == _model_tuple(full)
    # and serving through the maintained index matches the refit
    top_m = bm25_topk(docs, merged, ["data", "the"], 5).collect()
    top_f = bm25_topk(docs, full, ["data", "the"], 5).collect()
    assert [tuple(r) for r in top_m] == [tuple(r) for r in top_f]


def test_update_requires_complete_model(spark, corpus_df):
    # a min_df>1 fit discarded the tail — update must refuse
    pruned = fit_bm25_index(corpus_df, min_df=2)
    assert not pruned.complete
    with pytest.raises(ValueError, match="full corpus vocabulary"):
        update_bm25_index(pruned, corpus_df)
    # a query fit covers only its terms — update must refuse
    qfit = fit_bm25(corpus_df, TERMS, k1=K1, b=B)
    with pytest.raises(ValueError, match="full corpus vocabulary"):
        update_bm25_index(qfit, corpus_df)


def test_update_empty_batch_is_noop(spark, corpus_df):
    model = fit_bm25_index(corpus_df, k1=K1, b=B)
    empty = spark.createDataFrame([], "doc_id long, text string")
    nulls = spark.createDataFrame(
        [(99, None)], "doc_id long, text string"
    )
    assert _model_tuple(update_bm25_index(model, empty)) == \
        _model_tuple(model)
    assert _model_tuple(update_bm25_index(model, nulls)) == \
        _model_tuple(model)


def test_update_cap_raises(spark, corpus_df):
    model = fit_bm25_index(corpus_df)
    extra = spark.createDataFrame(
        [(100, "brandnewterm anotherone")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_terms"):
        update_bm25_index(model, extra, max_terms=len(model.df) + 1)
