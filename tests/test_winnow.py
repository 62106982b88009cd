"""Winnowing fingerprints (operators/winnow.py): differential
against a verbatim Python restatement of the published selection
rule, the coverage guarantee, candidate-pair semantics, and plan
shape (no cartesian, no Python)."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.operators.winnow import (
    winnow_candidate_pairs,
    winnow_fingerprints,
)

K, W = 5, 4


def _bucket(s):
    # the engine's full-width 60-bit grain (sampling._hash_u60 shape)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text, k=K, w=W):
    """The published rule verbatim: window-min, rightmost tie-break,
    distinct selections; short docs degrade to one degenerate
    window."""
    if text is None:
        return set()
    hs = [_bucket(text[i:i + k]) for i in range(len(text) - k + 1)] \
        if len(text) >= k else []
    if not hs:
        return set()
    if len(hs) < w:
        starts, ww = [0], len(hs)
    else:
        starts, ww = range(len(hs) - w + 1), w
    sel = set()
    for s in starts:
        vals = hs[s:s + ww]
        mn = min(vals)
        pos = s + ww - 1 - vals[::-1].index(mn)
        sel.add((pos, hs[pos]))
    return sel


def _run(spark, corpus, **kw):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {}
    for r in winnow_fingerprints(df, **kw).collect():
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return out


def test_differential_on_real_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    rows = docs.select("doc_id", "text").collect()
    n = 0
    for r in rows:
        exp = _py_winnow(r["text"])
        if r["text"] is None:
            assert r["doc_id"] not in got
            continue
        assert got.get(r["doc_id"], set()) == exp, r["doc_id"]
        n += 1
    assert n > 0


def test_edge_lengths(spark):
    corpus = [
        (1, None),
        (2, ""),
        (3, "abc"),        # shorter than k: no fingerprints
        (4, "abcde"),      # exactly k: one gram, one fingerprint
        (5, "abcdefg"),    # fewer than w grams: degenerate window
    ]
    got = _run(spark, corpus)
    assert 1 not in got and 2 not in got and 3 not in got
    assert got[4] == _py_winnow("abcde")
    assert len(got[4]) == 1
    assert got[5] == _py_winnow("abcdefg")


def test_rightmost_tie_break(spark):
    # a periodic string forces repeated equal hashes inside windows
    t = "ababababababab"
    got = _run(spark, [(1, t)])
    assert got[1] == _py_winnow(t)


def test_fuzz_differential(spark):
    rng = random.Random(37)
    corpus = [
        (i, "".join(rng.choice("abcab ") for _ in range(rng.randint(0, 40))))
        for i in range(60)
    ]
    got = _run(spark, corpus)
    for i, t in corpus:
        assert got.get(i, set()) == _py_winnow(t), (i, t)


def test_coverage_guarantee_and_candidates(spark):
    """The published guarantee: a shared substring of >= w + k - 1
    chars yields a shared fingerprint — the candidate join must
    surface the pair."""
    shared = "thequickbrownfoxjumps"  # 21 >= w + k - 1 = 8
    corpus = [
        (1, "xxxx" + shared + "yyyy"),
        (2, "zzzz" + shared + "wwww"),
        (3, "completely unrelated content here"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    fps = {
        d: {r["fp"] for r in rows}
        for d, rows in (
            (d, [r for r in winnow_fingerprints(df).collect()
                 if r["doc_id"] == d])
            for d in (1, 2)
        )
    }
    assert fps[1] & fps[2]  # the guarantee
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_candidate_pairs(df, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(a < b for a, b in pairs)


def test_contract_errors_and_plan(spark):
    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError, match="w must be"):
        winnow_fingerprints(df, w=0)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_candidate_pairs(df, min_shared=0)
    plan = winnow_candidate_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Cartesian" not in plan
    assert "EvalPython" not in plan  # all native, no kernels


def test_max_df_stop_gram_cut(spark):
    """Fingerprints selected in more than max_df docs are cut before
    pairing — pairs supported ONLY by ubiquitous fingerprints
    vanish.  Ten identical documents: every fingerprint has df=10,
    so max_df=9 removes every pair while the loose run pairs all."""
    corpus = [(i, "the quick brown fox jumps") for i in range(10)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    loose = winnow_candidate_pairs(
        df, min_shared=1, max_df=1000
    ).count()
    assert loose == 45  # all 10-choose-2 pairs
    tight = winnow_candidate_pairs(df, min_shared=1, max_df=9)
    assert tight.count() == 0
    with pytest.raises(ValueError, match="max_df"):
        winnow_candidate_pairs(df, max_df=1)
