"""Benchmark-decontamination operator: differential vs a naive Python
reference, edge cases, and plan-shape pins (broadcast join, single
gram evaluation per side)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.operators.decontam import (
    benchmark_gram_set,
    contamination_report,
    decontaminate,
    doc_ngram_hashes,
)


def _norm_words(text: str) -> list[str]:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")


def _grams(text: str, n: int) -> list[tuple[str, ...]]:
    ws = _norm_words(text)
    if len(ws) < n:
        return [tuple(ws)]
    return [tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)]


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "completely unrelated text about spark catalyst optimizer internals and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank today "
        "with a long unique tail that the benchmark never saw at all ever"),
    (4, "short doc"),
    (5, "Short,  DOC!"),  # normalizes identically to doc 4
]
BENCH = [
    ("the quick brown fox jumps over the lazy dog near the river bank today",),
    ("short doc",),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    return docs, bench


def _naive_report(n: int) -> dict[int, tuple[int, int]]:
    bench_grams = {g for (t,) in BENCH for g in _grams(t, n)}
    out = {}
    for doc_id, text in DOCS:
        gs = _grams(text, n)
        hits = sum(1 for g in gs if g in bench_grams)
        out[doc_id] = (len(gs), hits)
    return out


@pytest.mark.parametrize("n", [2, 13])
def test_report_matches_naive(frames, n):
    docs, bench = frames
    got = {
        r.doc_id: (r.n_grams, r.n_hits)
        for r in contamination_report(docs, bench, n=n, threshold=0.5).collect()
    }
    assert got == _naive_report(n)


def test_exact_copy_and_short_docs_fully_contaminated(frames):
    docs, bench = frames
    rep = {r.doc_id: r for r in contamination_report(docs, bench, n=13).collect()}
    assert rep[1].hit_frac == 1.0 and rep[1].contaminated
    # normalization: punctuation/case variants of a benchmark item match
    assert rep[4].hit_frac == 1.0 and rep[5].hit_frac == 1.0
    assert rep[2].n_hits == 0 and not rep[2].contaminated
    # doc 3 = benchmark doc + 14-word unique tail: partial overlap
    assert 0 < rep[3].hit_frac < 1


def test_threshold_boundary(frames):
    docs, bench = frames
    # doc 3's exact fraction decides contamination at that threshold
    frac = {
        r.doc_id: r.hit_frac
        for r in contamination_report(docs, bench, n=13).collect()
    }[3]
    at = contamination_report(docs, bench, n=13, threshold=frac)
    above = contamination_report(docs, bench, n=13, threshold=min(1.0, frac * 1.01))
    assert {r.doc_id for r in at.filter("contaminated").collect()} >= {1, 3}
    assert 3 not in {r.doc_id for r in above.filter("contaminated").collect()}


def test_decontaminate_drops_only_flagged(frames):
    docs, bench = frames
    kept = decontaminate(docs, bench, n=13, threshold=0.5)
    assert {r.doc_id for r in kept.collect()} == {2, 3}
    # schema passes through untouched
    assert kept.columns == docs.columns


def test_report_covers_every_doc(frames):
    docs, bench = frames
    assert contamination_report(docs, bench, n=13).count() == len(DOCS)


def test_gram_helpers(frames, spark):
    docs, bench = frames
    g = doc_ngram_hashes(docs, n=2)
    rows = g.groupBy("doc_id").agg(
        F.count("*").alias("k"), F.first("n_grams").alias("n")
    ).collect()
    for r in rows:
        assert r.k == r.n  # one exploded row per gram
    # benchmark gram set is distinct
    bg = benchmark_gram_set(bench, n=2)
    assert bg.count() == bg.distinct().count()


def test_plan_shape(frames):
    docs, bench = frames
    rep = contamination_report(docs, bench, n=13)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    # the gram expression is evaluated exactly once per side: outer +
    # inner transform, twice (corpus, benchmark) — any implicit
    # explode filter or projection collapse would add more copies
    assert plan.count("transform(") == 4


def test_validation_errors(frames):
    docs, bench = frames
    with pytest.raises(ValueError):
        contamination_report(docs, bench, threshold=0.0)
    with pytest.raises(ValueError):
        doc_ngram_hashes(docs, n=0)


def _canon_report(df):
    return sorted(
        (r.doc_id, r.n_grams, r.n_hits, round(r.hit_frac, 9), r.contaminated)
        for r in df.collect()
    )


@pytest.mark.parametrize("n", [2, 13])
def test_bloom_report_identical_to_broadcast(frames, n):
    """The large-benchmark Bloom path must be BIT-IDENTICAL to the
    broadcast path: Bloom has no false negatives, and the exact
    semi-join strips its false positives."""
    from wikiextractor_spark.operators.decontam import (
        contamination_report_bloom,
    )

    docs, bench = frames
    want = _canon_report(contamination_report(docs, bench, n=n, threshold=0.5))
    got = _canon_report(
        contamination_report_bloom(docs, bench, n=n, threshold=0.5)
    )
    assert got == want


def test_bloom_report_survives_heavy_false_positives(frames):
    """A deliberately tiny bitmap (512 bits, k=2) makes Bloom false
    positives near-certain — the exact semi-join must still strip
    every one, leaving results identical to the broadcast path."""
    from wikiextractor_spark.operators.decontam import (
        contamination_report_bloom,
    )

    docs, bench = frames
    want = _canon_report(contamination_report(docs, bench, n=2, threshold=0.5))
    got = _canon_report(
        contamination_report_bloom(
            docs, bench, n=2, threshold=0.5, m_bits=512, k=2
        )
    )
    assert got == want


def test_bloom_prefilter_drops_noncandidates(spark):
    """On a corpus with NO benchmark overlap and a well-sized bitmap,
    the Bloom prefilter passes (almost) nothing into the exact join —
    the property that keeps the shuffle a sliver at corpus scale."""
    import numpy as np

    from wikiextractor_spark.operators.decontam import (
        _bloom_positions,
        benchmark_gram_set,
        build_bloom,
    )

    docs = spark.range(500).selectExpr(
        "id AS doc_id",
        "concat('unique words num', CAST(id AS STRING), ' follow here now then') AS text",
    )
    bench = spark.createDataFrame(
        [("entirely different benchmark sentence about nothing shared",)],
        "text string",
    )
    bench_hashes = benchmark_gram_set(bench, n=3)
    bitmap = build_bloom(bench_hashes, m_bits=1 << 20, k=6)
    # every benchmark gram must probe positive (no false negatives)
    vals = np.array(
        [r.gram_hash for r in bench_hashes.collect()], dtype=np.int64
    ).view(np.uint64)
    for pos in _bloom_positions(vals, 1 << 20, 6):
        assert ((bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all()

    from wikiextractor_spark.operators.decontam import (
        _explode_with_count,
        contamination_report_bloom,
    )

    report = contamination_report_bloom(docs, bench, n=3, threshold=0.5)
    rows = report.collect()
    assert len(rows) == 500
    assert all(r.n_hits == 0 and not r.contaminated for r in rows)


def test_decontaminate_bloom_route(frames):
    """decontaminate(benchmark_broadcast=False) drops exactly the docs
    the broadcast route drops."""
    docs, bench = frames
    want = sorted(
        r.doc_id
        for r in decontaminate(docs, bench, n=2, threshold=0.5).collect()
    )
    got = sorted(
        r.doc_id
        for r in decontaminate(
            docs, bench, n=2, threshold=0.5, benchmark_broadcast=False
        ).collect()
    )
    assert got == want
