"""Sentence-aware chunking (operators/chunking.py chunk_sentences):
differential against an independent Python restatement, the
byte-layout reconstruction property, budget/over-budget semantics,
and edge documents."""

from __future__ import annotations

import random
import re

import pytest

from wikiextractor_spark.operators.chunking import chunk_sentences
from wikiextractor_spark.operators.spans import SENTENCE_PATTERN


def _words(piece):
    return len([x for x in re.split(r"[ \t\n\r\f\v]+", piece) if x])


def _reference(text, budget):
    if text is None:
        return []
    chunks = []
    for p in re.findall(SENTENCE_PATTERN, text):
        w = _words(p)
        if chunks and chunks[-1][1] + w <= budget:
            t, cw, n = chunks[-1]
            chunks[-1] = (t + p, cw + w, n + 1)
        else:
            chunks.append((p, w, 1))
    return [
        (i, t, w, n, w > budget)
        for i, (t, w, n) in enumerate(chunks)
    ]


def _run(spark, corpus, budget):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {}
    for r in chunk_sentences(df, budget_words=budget).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_no"], r["chunk"], r["n_words"],
             r["n_sentences"], r["over_budget"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_greedy_fill_and_boundaries(spark):
    text = "one two. three four five! six? seven eight nine ten."
    got = _run(spark, [(1, text)], budget=5)
    exp = _reference(text, 5)
    assert got[1] == exp
    # chunks concatenate back to the original text verbatim
    assert "".join(c[1] for c in got[1]) == text
    # no chunk splits a sentence: every chunk ends at a piece bound
    for _no, chunk, _w, _n, _ob in got[1]:
        assert "".join(re.findall(SENTENCE_PATTERN, chunk)) == chunk


def test_oversize_sentence_is_own_chunk(spark):
    text = "a b c d e f g h. tiny."
    got = _run(spark, [(1, text)], budget=3)
    exp = _reference(text, 3)
    assert got[1] == exp
    assert got[1][0][4] is True       # 8-word sentence flagged
    assert got[1][0][3] == 1          # alone in its chunk
    assert got[1][1][4] is False


def test_edges(spark):
    got = _run(
        spark,
        [(1, None), (2, ""), (3, "..!!"), (4, "no terminator")],
        budget=4,
    )
    assert 1 not in got and 2 not in got
    assert got[3] == _reference("..!!", 4)     # punct-only piece
    assert got[4] == _reference("no terminator", 4)


def test_fuzz_differential(spark):
    rng = random.Random(41)
    sents = ["aa bb.", " c!", " dd ee ff?", " g h i j k l.", "tail"]
    corpus = []
    for i in range(40):
        corpus.append(
            (i, "".join(rng.choice(sents)
                        for _ in range(rng.randint(0, 8))))
        )
    for budget in (1, 3, 7, 50):
        got = _run(spark, corpus, budget)
        for i, t in corpus:
            assert got.get(i, []) == _reference(t, budget), (i, budget)


def test_contract_and_real_docs(spark, sf_dir):
    df = spark.createDataFrame([(1, "a.")], "doc_id long, text string")
    with pytest.raises(ValueError, match="budget_words"):
        chunk_sentences(df, budget_words=0)
    # the corpus has no sentence punctuation: every doc = one
    # unterminated piece → one chunk per doc under a big budget
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_sentences(docs, budget_words=10**6)
    n_docs = docs.filter("text IS NOT NULL AND text <> ''").count()
    assert out.count() == n_docs
    assert out.filter("chunk_no <> 0").count() == 0
