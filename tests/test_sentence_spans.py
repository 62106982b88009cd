"""C4-rule three-sentence-span dedup (operators/spans.py
dedup_sentence_spans): keep-first semantics, byte-layout
preservation, and a fuzz differential against an independent pure-
Python restatement."""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from wikiextractor_spark.operators.spans import (
    SENTENCE_PATTERN,
    dedup_sentence_spans,
    sentence_array,
)


def _pieces(text):
    return re.findall(SENTENCE_PATTERN, text)


def _norm(s):
    return re.sub(r"[ \t\n\r\f\v]+", " ", s).strip().lower()


def _reference(corpus, n=3, min_count=2):
    """Independent single-pass restatement of the stated semantics."""
    occ = {}  # key -> list[(doc_id, idx)]
    pieces = {}
    for doc_id, text in corpus:
        if text is None:
            continue
        ps = _pieces(text)
        pieces[doc_id] = ps
        for i in range(len(ps) - n + 1):
            key = hashlib.md5(
                _norm("".join(ps[i:i + n])).encode()
            ).hexdigest()
            occ.setdefault(key, []).append((doc_id, i))
    cut = {}  # doc_id -> set of sentence idx
    for key, locs in occ.items():
        if len(locs) < min_count:
            continue
        win = min(locs)
        for doc_id, i in locs:
            if (doc_id, i) == win:
                continue
            cut.setdefault(doc_id, set()).update(
                range(i, i + n)
            )
    out = {}
    for doc_id, text in corpus:
        if text is None:
            out[doc_id] = (None, None)
            continue
        ps = pieces[doc_id]
        c = cut.get(doc_id, set())
        kept = [p for i, p in enumerate(ps) if i not in c]
        out[doc_id] = ("".join(kept), len(ps) - len(kept))
    return out


def _run(spark, corpus, **kw):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text"], r["n_removed_sentences"])
        for r in dedup_sentence_spans(df, **kw).collect()
    }


def test_sentence_pieces_concat_verbatim():
    for t in [
        "One. Two! Three? tail",
        "..!!  x. ",
        "no terminator at all",
        "",
        "A.B.C.",
    ]:
        assert "".join(_pieces(t)) == t


def test_keep_first_occurrence(spark):
    span = "alpha one. beta two. gamma three."
    corpus = [
        (1, "intro. " + span + " outro."),
        (2, "other start! " + span + " different end."),
        (3, span),
    ]
    got = _run(spark, corpus)
    exp = _reference(corpus)
    assert got == exp
    # the first doc keeps the span text; the later ones lose exactly
    # those three sentences
    assert "alpha one." in got[1][0]
    assert "alpha one." not in got[2][0]
    assert "alpha one." not in got[3][0]
    assert got[3][0] == "" and got[3][1] == 3


def test_short_docs_and_unique_text_untouched(spark):
    corpus = [
        (1, "only two. sentences here."),
        (2, "unique a. unique b. unique c. unique d."),
        (3, None),
        (4, ""),
    ]
    got = _run(spark, corpus)
    assert got[1] == ("only two. sentences here.", 0)
    assert got[2] == ("unique a. unique b. unique c. unique d.", 0)
    assert got[3] == (None, None)
    assert got[4] == ("", 0)


def test_key_normalization_case_and_whitespace(spark):
    corpus = [
        (1, "Spam Alpha. Spam Beta! Spam Gamma?x"),
        (2, "spam  alpha.   spam beta!  spam gamma?y"),
    ]
    got = _run(spark, corpus)
    exp = _reference(corpus)
    assert got == exp
    assert got[1][1] == 0 and got[2][1] == 3


def test_within_doc_repetition(spark):
    span = "r one. r two. r three."
    corpus = [(7, span + " mid. " + span + " end.")]
    got = _run(spark, corpus)
    exp = _reference(corpus)
    assert got == exp
    assert got[7][1] == 3  # second occurrence removed


def test_contract_errors(spark):
    df = spark.createDataFrame([(1, "a.")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_count"):
        dedup_sentence_spans(df, min_count=1)
    with pytest.raises(ValueError, match="n must be"):
        dedup_sentence_spans(df, n=0)


def test_fuzz_differential(spark):
    rng = random.Random(29)
    sents = [
        f"{w} {x}." for w in "abcdef" for x in "pq"
    ] + ["t!", "u?", "v"]
    corpora = []
    for _ in range(4):
        corpus = []
        for doc_id in range(12):
            k = rng.randint(0, 8)
            corpus.append(
                (doc_id,
                 " ".join(rng.choice(sents) for _ in range(k)))
            )
        corpora.append(corpus)
    for corpus in corpora:
        got = _run(spark, corpus)
        assert got == _reference(corpus), corpus


def test_sentence_array_column(spark):
    df = spark.createDataFrame(
        [(1, "A. B! tail"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", sentence_array("text").alias("s")
        ).collect()
    }
    assert rows[1] == ["A.", " B!", " tail"]
    assert rows[2] is None
    assert rows[3] == []
