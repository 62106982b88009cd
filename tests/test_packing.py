"""Sequence packing (operators/packing.py) and the end-to-end corpus
composition (operators/corpus.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from wikiextractor_spark.operators.corpus import prepare_corpus
from wikiextractor_spark.operators.packing import (
    assemble_packs,
    pack_sequences,
    pack_stats,
)

BUDGET = 100


@pytest.fixture(scope="module")
def token_df(spark):
    # adversarial mix: exact-budget rows, tiny rows, an over-budget
    # row, and a spread that forces multi-bin packing
    rows = [(i, t) for i, t in enumerate(
        [100, 1, 99, 50, 50, 50, 33, 33, 33, 250, 7, 93, 60, 41]
    )]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_every_row_assigned_once(spark, token_df):
    packed = pack_sequences(token_df, budget=BUDGET).cache()
    assert packed.count() == token_df.count()
    assert packed.select("doc_id").distinct().count() == token_df.count()
    # token counts survive the round-trip
    got = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    want = {r["doc_id"]: r["n_tokens"] for r in token_df.collect()}
    assert got == want


def test_no_normal_pack_exceeds_budget(spark, token_df):
    packed = pack_sequences(token_df, budget=BUDGET)
    sums = (
        packed.filter(~F.col("over_budget"))
        .groupBy("pack_id").agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    assert sums and all(r["s"] <= BUDGET for r in sums)


def test_over_budget_rows_isolated(spark, token_df):
    packed = pack_sequences(token_df, budget=BUDGET).cache()
    over = packed.filter(F.col("over_budget")).collect()
    assert [r["doc_id"] for r in over] == [9]  # the 250-token row
    # its pack contains nothing else
    pid = over[0]["pack_id"]
    assert packed.filter(F.col("pack_id") == pid).count() == 1


def test_deterministic(spark, token_df):
    a = sorted(map(tuple, pack_sequences(token_df, budget=BUDGET).collect()))
    b = sorted(map(tuple, pack_sequences(token_df, budget=BUDGET).collect()))
    assert a == b


def test_packing_is_reasonably_tight(spark, token_df):
    """FFD within a group must not be far from the token-sum lower
    bound.  One group ⇒ the classic FFD guarantee applies."""
    packed = pack_sequences(token_df, budget=BUDGET, num_groups=1)
    n_packs = (
        packed.filter(~F.col("over_budget"))
        .select("pack_id").distinct().count()
    )
    tok_sum = sum(
        r["n_tokens"] for r in token_df.filter(F.col("n_tokens") <= BUDGET).collect()
    )
    lower = -(-tok_sum // BUDGET)  # ceil
    assert n_packs <= 2 * lower  # loose, but catches degenerate 1-per-pack


def test_pack_stats(spark, token_df):
    packed = pack_sequences(token_df, budget=BUDGET, num_groups=1)
    stats = pack_stats(packed, BUDGET).collect()[0]
    assert stats["n_packs"] >= 1
    assert 0.0 < stats["mean_fill"] <= 1.0
    assert stats["wasted_tokens"] >= 0


def _ids_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, token_ids array<long>"
    )


def test_assemble_packs_content_and_budget(spark):
    """Every document's id stream appears exactly once, concatenated
    in ascending doc_id order within its pack; non-over-budget packs
    respect the budget including separators; over-budget rows ride
    alone flagged."""
    rows = [
        (1, [10, 11, 12]),
        (2, [20]),
        (3, [30, 31]),
        (4, list(range(100, 100 + 9))),  # 9 ids + sep = 10 > budget 8
    ]
    df = _ids_df(spark, rows)
    out = assemble_packs(
        df, budget=8, num_groups=1, sep_id=0
    ).collect()
    by_doc = dict(rows)
    seen_docs = []
    for r in out:
        ids = list(r["token_ids"])
        assert r["n_tokens"] == len(ids)
        if not r["over_budget"]:
            assert len(ids) <= 8
        # decompose by separator: every chunk must be a whole doc's
        # stream, in ascending doc order within the pack
        assert ids[-1] == 0  # sep after EVERY doc incl. the last
        chunks, cur = [], []
        for x in ids:
            if x == 0:
                chunks.append(cur)
                cur = []
            else:
                cur.append(x)
        assert cur == []
        assert r["n_docs"] == len(chunks)
        doc_ids = []
        for c in chunks:
            matches = [d for d, s in by_doc.items() if s == c]
            assert len(matches) == 1, (c, ids)
            doc_ids.append(matches[0])
        assert doc_ids == sorted(doc_ids)
        seen_docs.extend(doc_ids)
    assert sorted(seen_docs) == [1, 2, 3, 4]
    over = [r for r in out if r["over_budget"]]
    assert len(over) == 1 and over[0]["n_docs"] == 1
    assert list(over[0]["token_ids"])[:-1] == by_doc[4]


def test_assemble_packs_no_separator_and_empty_docs(spark):
    rows = [(1, [5, 6]), (2, []), (3, [7])]
    out = assemble_packs(
        _ids_df(spark, rows), budget=3, num_groups=1
    ).collect()
    all_ids = sorted(x for r in out for x in r["token_ids"])
    assert all_ids == [5, 6, 7]  # empty doc contributes nothing
    assert sum(r["n_docs"] for r in out) == 3
    assert all(not r["over_budget"] for r in out)
    assert all(r["n_tokens"] <= 3 for r in out)


def test_zero_cost_rows_never_join_over_budget_packs(spark):
    """r12 review: a zero-cost row (empty document, no separator)
    must not first-fit into an over-budget dedicated pack — dedicated
    packs open at capacity -1 so 'over-budget rows ride alone' holds
    and over_budget stays constant within every pack."""
    rows = [(1, list(range(100, 110))), (2, [])]  # costs 10 and 0
    out = assemble_packs(
        _ids_df(spark, rows), budget=8, num_groups=1
    ).collect()
    assert len(out) == 2
    over = [r for r in out if r["over_budget"]]
    norm = [r for r in out if not r["over_budget"]]
    assert len(over) == 1 and over[0]["n_docs"] == 1
    assert len(norm) == 1 and norm[0]["n_docs"] == 1
    assert list(norm[0]["token_ids"]) == []
    # the raw assignment agrees: distinct packs, flags constant
    asg = pack_sequences(
        _ids_df(spark, rows).withColumn(
            "n", F.size("token_ids").cast("long")
        ),
        token_col="n", budget=8, num_groups=1,
    ).collect()
    by_doc = {r["doc_id"]: r for r in asg}
    assert by_doc[1]["pack_id"] != by_doc[2]["pack_id"]
    assert by_doc[1]["over_budget"] and not by_doc[2]["over_budget"]


def test_negative_costs_raise(spark):
    """r12 review: a negative token cost would 'fit' the -1 dedicated
    packs and inflate their capacity — corrupt input raises inside
    the packing kernel instead of silently mis-packing."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    df = spark.createDataFrame(
        [(1, 250), (2, -5)], "doc_id long, n_tokens long"
    )
    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        pack_sequences(df, budget=100, num_groups=1).collect()
    assert "negative n_tokens" in str(exc.value)


def test_assemble_packs_rejects_null_streams(spark):
    # the guard rides JVM-side in the cost projection (r13), so it
    # surfaces as a Spark runtime error during the result
    # materialization, carrying the stated message
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, None)], "doc_id long, token_ids array<long>"
    )
    with pytest.raises(Exception, match="NULL token_ids"):
        assemble_packs(df, budget=8)
    # persist_input=False: the raise surfaces at the caller's first
    # action over the lazy result
    lazy = assemble_packs(df, budget=8, persist_input=False)
    with pytest.raises(Exception, match="NULL token_ids"):
        lazy.collect()


def test_assemble_packs_chains_from_tokenizer(spark):
    """The full emit path: tokenize to ids → assemble — counts in the
    pack equal the kernel's id counts plus one separator per doc."""
    from wikiextractor_spark.functions.tokenizer import (
        bpe_token_ids,
        vocab_from_tokens,
    )

    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "west"), (3, "newest lowest")],
        "doc_id long, text string",
    )
    vocab = vocab_from_tokens(
        spark, ["low", "er", "west", "ne", "st"], 1.0
    )
    ids = bpe_token_ids(docs, vocab, {}, out_col="token_ids")
    out = assemble_packs(
        ids.select("doc_id", "token_ids"), budget=64, num_groups=1,
        sep_id=-100,
    ).collect()
    n_ids = {
        r["doc_id"]: len(r["token_ids"])
        for r in ids.select(
            "doc_id", "token_ids"
        ).collect()
    }
    assert sum(r["n_tokens"] for r in out) == sum(n_ids.values()) + 3


def test_segment_tree_first_fit_equals_linear_scan(spark):
    """The capacity-indexed first fit must be ASSIGNMENT-IDENTICAL to
    the naive linear scan (the segment tree's leftmost descent finds
    the same lowest-indexed fitting pack)."""
    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 130)) for i in range(400)]
    packed = {
        r["doc_id"]: (r["pack_id"], r["over_budget"])
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id long, n_tokens long"),
            budget=BUDGET, num_groups=1,
        ).collect()
    }

    # reference: the pre-r4 linear-scan FFD, group 0 only.  Dedicated
    # over-budget packs hold capacity -1 (r12): a zero-cost row must
    # skip them ('over-budget rows ride alone'), which the old cap-0
    # modeling violated.
    srt = sorted(rows, key=lambda t: (-t[1], t[0]))
    caps: list[int] = []
    want = {}
    for i, toks in srt:
        if toks > BUDGET:
            caps.append(-1)
            want[i] = (len(caps) - 1, True)
            continue
        for j, c in enumerate(caps):
            if toks <= c:
                caps[j] = c - toks
                want[i] = (j, False)
                break
        else:
            caps.append(BUDGET - toks)
            want[i] = (len(caps) - 1, False)
    assert packed == want


def test_packing_adversarial_mix_is_fast(spark):
    """10⁵ near-half-budget rows in ONE group: every row fails to fit
    every open pack, the old linear scan's O(n²) worst case (minutes);
    the segment tree answers each probe from the root in O(1) here.
    Done-criterion from r3: finishes in seconds."""
    import time

    df = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        (F.lit(BUDGET // 2 + 1) + (F.col("id") % 10)).alias("n_tokens"),
    )
    t0 = time.monotonic()
    packed = pack_sequences(df, budget=BUDGET, num_groups=1).cache()
    n = packed.count()
    elapsed = time.monotonic() - t0
    assert n == 100_000
    # every pack holds exactly one row (nothing fits with anything)
    assert packed.select("pack_id").distinct().count() == 100_000
    assert elapsed < 60, f"adversarial packing took {elapsed:.1f}s"


def test_prepare_corpus_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = prepare_corpus(
        docs,
        min_quality=0.0,
        dedup="exact",
        sample_fraction=0.5,
        chunk_tokens=64,
        overlap=16,
        pack_budget=256,
    ).cache()
    n = out.count()
    assert n > 0
    # chunk grain: every chunk_id unique, every chunk in exactly one pack
    assert out.select("chunk_id").distinct().count() == n
    sums = (
        out.filter(~F.col("over_budget"))
        .groupBy("pack_id").agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    assert all(r["s"] <= 256 for r in sums)
    # no chunk exceeds the chunk size, so nothing can be over budget
    assert out.filter(F.col("over_budget")).count() == 0
    # sampling happened at DOCUMENT grain: doc count strictly between
    # 0 and the deduped doc total
    n_docs = out.select("doc_id").distinct().count()
    n_all = docs.count()
    assert 0 < n_docs < n_all


def test_prepare_corpus_chunk_id_range_guard(spark):
    """chunk_id = doc_id << 20 | chunk_no collides silently out of
    range — the in-projection raise_error guard must trip for
    doc_id >= 2^43 (r3 'What's wrong' #4) and stay silent in range."""
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    bad = spark.createDataFrame(
        [(1 << 43, "alpha beta gamma delta " * 20)], "doc_id long, text string"
    )
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception),
                       match="chunk_id packing needs"):
        prepare_corpus(
            bad, dedup=None, chunk_tokens=16, pack_budget=64
        ).collect()
    ok = spark.createDataFrame(
        [((1 << 43) - 1, "alpha beta gamma delta " * 20)],
        "doc_id long, text string",
    )
    rows = prepare_corpus(
        ok, dedup=None, chunk_tokens=16, pack_budget=64
    ).collect()
    assert rows and all(
        r["chunk_id"] == ((1 << 43) - 1) * (1 << 20) + r["chunk_no"]
        for r in rows
    )


def test_prepare_corpus_repetition_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "a perfectly normal document with plenty of distinct words "
                "covering several different topics and never repeating itself "
                "even once across its full length today"),
            (2, "spam spam spam spam spam spam spam spam spam spam spam spam "
                "spam spam spam spam spam spam spam spam spam spam"),
            (3, "write to bob@example.com with plenty of other distinct words "
                "covering several different topics and never repeating itself "
                "even once across its full length today"),
        ],
        "doc_id long, text string",
    )
    out = prepare_corpus(docs, dedup=None, drop_repetitive=True, redact=True)
    rows = {r.doc_id: r.text for r in out.collect()}
    assert set(rows) == {1, 3}          # repetitive doc dropped
    assert "<EMAIL>" in rows[3] and "bob@" not in rows[3]


def test_prepare_corpus_with_decontamination(spark, sf_dir):
    """The optional benchmark stage drops exact copies of benchmark
    docs while leaving the rest of the composition intact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.orderBy("doc_id").limit(2).select("text")
    kept = prepare_corpus(docs, dedup=None, benchmark=bench,
                          decontam_threshold=0.5)
    dropped = docs.count() - kept.count()
    assert dropped >= 2  # at least the two planted benchmark docs
    poisoned = {r.doc_id for r in docs.orderBy("doc_id").limit(2).collect()}
    assert not {r.doc_id for r in kept.select("doc_id").collect()} & poisoned


def test_prepare_corpus_token_budget(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0]["t"]
    out = prepare_corpus(docs, dedup=None, token_budget=total // 2)
    got = out.select(F.sum(F.size(F.split("text", " "))).alias("t")).collect()[0]["t"]
    assert 0.7 * (total // 2) <= got <= 1.3 * (total // 2)
    with pytest.raises(ValueError):
        prepare_corpus(docs, sample_fraction=0.5, token_budget=100)


def test_prepare_corpus_filters_push_to_scan(spark, sf_dir):
    """The lang/quality filters must appear in the scan's pushed or
    post-scan filter stage BEFORE any exchange — i.e. the plan filters
    first, shuffles later."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import re

    out = prepare_corpus(docs, target_lang="en", dedup="exact")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # a Filter containing the language predicate sits DIRECTLY above
    # the FileScan (below the dedup Exchange), so the scan-side rows
    # are cut before any shuffle
    assert re.search(r"Filter .*= en\)\n\s*\+- FileScan", plan), plan


def test_prepare_corpus_dedup_against_kept_corpus(spark):
    """prepare_corpus(dedup_against=...) must drop near-copies of the
    already-kept corpus after in-corpus dedup, keeping genuinely new
    docs — the incremental crawl flow."""
    from pyspark.sql import functions as F

    from wikiextractor_spark.operators.corpus import prepare_corpus

    kept = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(50).localCheckpoint(eager=True)
    # crawl: copies of kept docs (shifted ids), an in-crawl dup pair,
    # and fresh docs
    fresh = spark.createDataFrame(
        [(90_000 + i,
          f"brand new crawl document {i} with vocabulary nothing "
          f"previously kept ever used {i * 13}")
         for i in range(10)],
        "doc_id long, text string",
    )
    crawl = (
        kept.limit(20).withColumn("doc_id", F.col("doc_id") + 50_000)
        .union(fresh)
        .union(fresh.limit(1).withColumn("doc_id", F.lit(99_999)))
    )
    out = prepare_corpus(
        crawl, dedup="exact", dedup_against=kept, cross_max_distance=3,
    )
    got = {r["doc_id"] for r in out.collect()}
    # copies of kept docs gone; in-crawl dup collapsed to smallest id;
    # fresh docs survive
    assert got == {90_000 + i for i in range(10)}, got


def test_prepare_corpus_lm_gate(spark):
    """The LM gate inside prepare_corpus drops low-logprob docs
    (gibberish under the corpus model) before dedup, and the knobs
    must be given together."""
    import pytest as _pytest

    from wikiextractor_spark.functions.lmquality import (
        doc_logprob_scores,
        fit_unigram_lm,
    )
    from wikiextractor_spark.operators.corpus import prepare_corpus

    docs = spark.createDataFrame(
        [(i, "common words repeated across every single document here")
         for i in range(20)]
        + [(99, "zzqqx wvvkj pplmn oorrt uuyyw")],
        "doc_id long, text string",
    )
    lm = fit_unigram_lm(docs, vocab_size=100)
    scores = {r["doc_id"]: r["mean_logp"]
              for r in doc_logprob_scores(docs, lm).collect()}
    cut = (scores[0] + scores[99]) / 2
    out = prepare_corpus(docs, logprob_lm=lm, min_mean_logp=cut, dedup="exact")
    got = {r["doc_id"] for r in out.collect()}
    assert 99 not in got and 0 in got
    # exact dedup collapsed the 20 identical docs to the smallest id
    assert got == {0}

    with _pytest.raises(ValueError, match="go together"):
        prepare_corpus(docs, logprob_lm=lm)


def test_prepare_corpus_boilerplate_stage(spark):
    """The boilerplate stage strips cross-document lines BEFORE dedup,
    so docs differing only in shared boilerplate collapse to one
    survivor; the output schema is unchanged (no n_removed_lines)."""
    bp = "Subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{bp}\nthe shared body text"),
            (2, f"the shared body text\n{bp}"),
            (3, f"{bp}\na different body entirely"),
            (4, "untouched document four"),
            (5, bp),  # entirely boilerplate -> dropped, not leaked empty
        ],
        "doc_id long, text string",
    )
    out = prepare_corpus(docs, boilerplate_min_docs=3, dedup="exact")
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(out.columns) == {"doc_id", "text"}
    assert 5 not in rows
    # docs 1 and 2 become identical after the strip -> one survivor
    assert len({1, 2} & set(rows)) == 1
    surviving = rows[min({1, 2} & set(rows))]
    assert surviving == "the shared body text"
    assert rows[3] == "a different body entirely"
    assert rows[4] == "untouched document four"

    # without the stage, nothing collapses and nothing drops
    noop = prepare_corpus(docs, dedup="exact")
    assert noop.count() == 5


def test_corpus_stats_and_lang_breakdown(spark):
    """corpus_stats: one-row profile with exact counts and sane
    signal rates; quantiles exact on a small corpus (the sketch is
    exact below its accuracy bound); lang_breakdown agrees with a
    full groupBy."""
    from wikiextractor_spark.operators.corpus import (
        corpus_stats,
        lang_breakdown,
    )

    # token counts 1..100 -> unambiguous quantiles, plus one empty
    # doc and one PII doc
    rows = [(i, " ".join(["the"] * i)) for i in range(1, 101)]
    rows.append((200, ""))
    rows.append((201, "write to someone@example.com for details"))
    rows.append((202, None))  # NULL text ≡ empty: same denominator
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    r = corpus_stats(docs).collect()[0]
    assert r["n_docs"] == 103
    # empty/NULL docs contribute ZERO tokens (split('') would report
    # a phantom one); the PII doc has 5 whitespace words
    assert r["n_tokens"] == sum(range(1, 101)) + 0 + 5 + 0
    assert 48 <= r["tokens_p50"] <= 51
    assert 94 <= r["tokens_p95"] <= 97
    assert abs(r["frac_pii"] - round(1 / 103, 4)) < 1e-9
    assert abs(r["frac_empty"] - round(2 / 103, 4)) < 1e-9
    # quality_score is a composite (unbounded above); the empty doc
    # must not ANSI-crash the average, it is just excluded
    assert r["avg_quality"] is not None and r["avg_quality"] > 0
    # 100 of 102 docs are single-token-repeated -> high repetitive rate
    assert 0.5 <= r["frac_repetitive"] <= 1.0

    lb = {r["lang"]: r["n"] for r in lang_breakdown(docs, k=5).collect()}
    from wikiextractor_spark.functions.textstats import lang_id

    full = {
        r["lang"]: r["n"]
        for r in docs.select(lang_id("text").alias("lang"))
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in lb.items():
        assert full[lang] == n
    assert sum(lb.values()) == 103 or len(lb) == 5


def test_prepare_corpus_semantic_decontamination(spark):
    """Docs whose embedding is paraphrase-close (cosine >= threshold)
    to a benchmark embedding drop, even though their TEXT shares no
    n-grams with anything; unrelated docs survive."""
    docs = spark.createDataFrame(
        [
            (1, "a reworded version of the benchmark idea entirely"),
            (2, "an unrelated document about something different"),
            (3, "yet another independent document on its own topic"),
        ],
        "doc_id long, text string",
    )
    # doc 1's embedding == the benchmark item (a paraphrase in
    # embedding space); docs 2/3 point elsewhere
    v_bench = [1.0] * 32 + [0.0] * 32
    v_other = [0.0] * 32 + [1.0] * 32
    v_third = ([1.0, -1.0] * 32)
    emb = spark.createDataFrame(
        [(1, v_bench), (2, v_other), (3, v_third)],
        "vec_id long, embedding array<float>",
    )
    bench_emb = spark.createDataFrame(
        [(900, [x * 3.0 for x in v_bench])],  # scaled: same direction
        "vec_id long, embedding array<float>",
    )
    out = prepare_corpus(
        docs, dedup=None,
        embeddings=emb, benchmark_embeddings=bench_emb,
        semantic_threshold=0.99,
    )
    assert {r["doc_id"] for r in out.collect()} == {2, 3}

    with pytest.raises(ValueError, match="unused"):
        prepare_corpus(docs, dedup=None, embeddings=emb)

    # non-64-dim embeddings work through semantic_lsh (dim=...); the
    # default dim would raise_error rather than silently degenerate
    emb32 = emb.select(
        "vec_id", F.expr("slice(embedding, 1, 32)").alias("embedding")
    )
    bench32 = bench_emb.select(
        "vec_id", F.expr("slice(embedding, 1, 32)").alias("embedding")
    )
    out32 = prepare_corpus(
        docs, dedup=None,
        embeddings=emb32, benchmark_embeddings=bench32,
        semantic_threshold=0.99, semantic_lsh={"dim": 32},
    )
    assert {r["doc_id"] for r in out32.collect()} == {2, 3}
    with pytest.raises(Exception, match="expected 64-dim"):
        prepare_corpus(
            docs, dedup=None,
            embeddings=emb32, benchmark_embeddings=bench32,
        ).collect()


def test_prepare_corpus_classifier_gate(spark):
    """The trained-classifier stage inside prepare_corpus drops
    model-rejected docs with the other narrow gates, stays a pure
    filter (no shuffle added), and respects a custom threshold."""
    from wikiextractor_spark.functions.classifier import (
        DEFAULT_MODEL,
        score_quality,
    )
    from wikiextractor_spark.operators.corpus import prepare_corpus

    good = ("the history of the village is a record of the people and "
            "the land with a school by the river known for its music")
    bad = "@#$% !!%^ 1234567 &&** 98765 ((&& 55555 ^^%$ 000111"
    docs = spark.createDataFrame(
        [(i, good) for i in range(5)] + [(99, bad)],
        "doc_id long, text string",
    )
    out = prepare_corpus(docs, classifier_model=DEFAULT_MODEL, dedup=None)
    got = {r["doc_id"] for r in out.collect()}
    assert 99 not in got and got == {0, 1, 2, 3, 4}

    # a threshold above every score drops everything
    top = score_quality(docs, DEFAULT_MODEL).agg(
        F.max("quality_logit")
    ).first()[0]
    assert prepare_corpus(
        docs, classifier_model=DEFAULT_MODEL,
        classifier_threshold=top + 1.0, dedup=None,
    ).count() == 0

    # the gate composes with dedup: survivors collapse to one doc
    assert {r["doc_id"] for r in prepare_corpus(
        docs, classifier_model=DEFAULT_MODEL, dedup="exact"
    ).collect()} == {0}


def test_prepare_corpus_content_gate(spark):
    """The hashed-gram content gate inside prepare_corpus drops docs
    whose vocabulary the fitted model rejects, and the knobs must be
    given together."""
    from wikiextractor_spark.functions.classifier import fit_hashed_classifier
    from wikiextractor_spark.operators.corpus import prepare_corpus

    good = "history village river school music people land record"
    bad = "viagra casino jackpot winner claim bonus prize lottery"
    labeled = spark.createDataFrame(
        [(i, good, 1) for i in range(10)]
        + [(100 + i, bad, 0) for i in range(10)],
        "doc_id long, text string, label int",
    )
    w, prior = fit_hashed_classifier(labeled)
    docs = spark.createDataFrame(
        [(1, good), (2, bad)], "doc_id long, text string"
    )
    out = prepare_corpus(
        docs, content_weights=(w, prior), min_content_logit=0.0, dedup=None
    )
    assert {r["doc_id"] for r in out.collect()} == {1}
    # output keeps the document schema (no score column leaks)
    assert out.columns == docs.columns

    with pytest.raises(ValueError, match="go together"):
        prepare_corpus(docs, content_weights=(w, prior))


def test_prepare_corpus_gopher_gate(spark):
    from wikiextractor_spark.operators.corpus import prepare_corpus

    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with energy "
         "and grace to be of note have"] * 5
    )
    docs = spark.createDataFrame(
        [(1, good), (2, " ".join(["#tag"] * 60))],
        "doc_id long, text string",
    )
    out = prepare_corpus(docs, gopher=True, dedup=None)
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_prepare_corpus_url_blocklist(spark):
    from wikiextractor_spark.operators.corpus import prepare_corpus

    docs = spark.createDataFrame(
        [(1, "keep this text", "https://good.org/a"),
         (2, "drop this text", "https://spam.bad.net/b")],
        "doc_id long, text string, url string",
    )
    out = prepare_corpus(docs, url_blocklist=["bad.net"], dedup=None)
    assert {r["doc_id"] for r in out.collect()} == {1}

    no_url = docs.drop("url")
    with pytest.raises(ValueError, match="no 'url' column"):
        prepare_corpus(no_url, url_blocklist=["bad.net"], dedup=None)


def test_prepare_corpus_semantic_dedup(spark):
    """dedup='semantic' drops embedding near-copies (SemDeDup grain),
    keeps docs without an embedding row, and validates its knobs."""
    from wikiextractor_spark.operators.corpus import prepare_corpus

    v1 = [1.0] + [0.0] * 63
    v2 = [0.999] + [0.001] * 63   # near-copy of v1
    v3 = [0.0] * 63 + [1.0]       # orthogonal
    docs = spark.createDataFrame(
        [(1, "first doc text"), (2, "second doc text"),
         (3, "third doc text"), (4, "doc with no embedding")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3)], "vec_id long, embedding array<double>"
    )
    out = prepare_corpus(
        docs, dedup="semantic", embeddings=emb,
        semantic_cluster={"n_clusters": 1},
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 4 in kept and 3 in kept       # unmapped + orthogonal survive
    assert len(kept & {1, 2}) == 1       # one of the near-pair drops

    with pytest.raises(ValueError, match="requires embeddings"):
        prepare_corpus(docs, dedup="semantic")
    with pytest.raises(ValueError, match="unused"):
        prepare_corpus(docs, dedup="exact", embeddings=emb)


def test_prepare_corpus_every_stage_at_once(spark):
    """The whole composition with EVERY stage enabled — the knob-
    interaction smoke: url blocklist, lang/quality/repetition/Gopher
    gates, shape + content classifiers, LM gate, boilerplate lines,
    near dedup, cross-corpus subtraction, n-gram + semantic
    decontamination, sampling, chunking, packing — one lazy-ish plan
    that must produce exactly the surviving good doc's chunks."""
    from wikiextractor_spark.functions.classifier import (
        DEFAULT_MODEL,
        fit_hashed_classifier,
    )
    from wikiextractor_spark.functions.lmquality import fit_unigram_lm
    from wikiextractor_spark.operators.corpus import prepare_corpus

    good = ("the history of the village is a record of the people and "
            "the land with a school by the river known for its music "
            "and the years of the growth that came to be of note have "
            "led to the state of the region that we see in the record "
            "now and the people of the village hold that the land and "
            "the river have given them the music and the school")
    boiler = "Subscribe to our newsletter"
    # doc 2 is a NEAR-dup (one word changed): identical docs would
    # make every line cross-document "boilerplate" and empty both
    rows = [
        (1, good + "\n" + boiler, "https://good.org/1"),
        (2, good.replace("music", "songs") + "\n" + boiler,
         "https://good.org/2"),
        (3, good, "https://spam.bad.net/x"),                  # blocked domain
        (4, "zzqqx wvvkj pplmn oorrt uuyyw " * 12, "https://good.org/4"),
        (5, "buy now " * 40, "https://good.org/5"),           # repetitive
        (6, "@#$% ^^&* !!! 123 456 789 000 111", "https://good.org/6"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    lm = fit_unigram_lm(docs.filter("doc_id in (1, 2)"), vocab_size=200)
    labeled = spark.createDataFrame(
        [(1, good, 1), (2, "casino jackpot winner bonus " * 8, 0)],
        "doc_id long, text string, label int",
    )
    w, prior = fit_hashed_classifier(labeled)
    bench = spark.createDataFrame(
        [(100, "completely unrelated benchmark prompt about astrophysics "
               "and the spectra of distant quasars measured at night")],
        "doc_id long, text string",
    )
    v = [1.0] + [0.0] * 63
    emb = spark.createDataFrame(
        [(i, v[-i:] + v[:-i]) for i in range(1, 7)],
        "vec_id long, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(100, [0.0] * 32 + [1.0] + [0.0] * 31)],
        "vec_id long, embedding array<double>",
    )
    out = prepare_corpus(
        docs,
        url_blocklist=["bad.net"],
        target_lang="en",
        min_quality=0.2,
        drop_repetitive=True,
        gopher=True,
        classifier_model=DEFAULT_MODEL,
        content_weights=(w, prior), min_content_logit=-5.0,
        logprob_lm=lm, min_mean_logp=-8.0,
        redact=True,
        boilerplate_min_docs=2,
        dedup="near", near_threshold=0.7,
        benchmark=bench,
        embeddings=emb, benchmark_embeddings=bench_emb,
        sample_fraction=1.0,
        chunk_tokens=16, overlap=0,
        pack_budget=64,
    )
    rows_out = out.collect()
    assert rows_out, "composition must keep the good document"
    kept_docs = {r["doc_id"] for r in rows_out}
    assert kept_docs == {1}  # near-dup collapsed, everything bad gone
    # boilerplate stripped before chunking
    assert all(boiler.lower() not in r["chunk"].lower() for r in rows_out)
    assert all(r["pack_id"] is not None for r in rows_out)


def test_assemble_packs_doc_starts(spark):
    """r13: doc_starts carries each document's first-token offset
    within the pack — exclusive prefix sum of (len + sep) blocks,
    starts[0] = 0, size = n_docs — with and without a separator, and
    the offsets index the stream correctly (token_ids[start] is the
    first id of that document's block)."""
    rows = [
        (1, [10, 11, 12]),
        (2, [20]),
        (3, [30, 31]),
        (4, [40, 41, 42, 43]),
        (5, []),
    ]
    by_doc = dict(rows)
    all_blocks: dict = {}
    for sep in (0, None):
        out = assemble_packs(
            _ids_df(spark, rows), budget=8, num_groups=1, sep_id=sep
        ).collect()
        ov = 0 if sep is None else 1
        for r in out:
            ids = list(r["token_ids"])
            starts = list(r["doc_starts"])
            assert len(starts) == r["n_docs"]
            assert starts[0] == 0
            # reconstruct: block lengths from consecutive starts must
            # partition the stream
            bounds = starts + [len(ids)]
            blocks = [
                ids[bounds[i]: bounds[i + 1] - ov]
                for i in range(len(starts))
            ]
            # the blocks partition the stream exactly
            flat = []
            for b in blocks:
                flat.extend(b + ([sep] if sep is not None else []))
            assert flat == ids
            all_blocks.setdefault(sep, []).extend(blocks)
        # bijection across the whole output: the multiset of blocks
        # equals the multiset of document streams
        got = sorted(map(tuple, all_blocks[sep]))
        want = sorted(map(tuple, by_doc.values()))
        assert got == want, (got, want)


def test_assemble_packs_doc_starts_over_budget(spark):
    """An over-budget document rides alone: starts == [0]."""
    out = assemble_packs(
        _ids_df(spark, [(1, list(range(20)))]), budget=8, num_groups=1,
        sep_id=99,
    ).collect()
    assert len(out) == 1 and out[0]["over_budget"]
    assert list(out[0]["doc_starts"]) == [0]
    assert out[0]["n_docs"] == 1


def test_pack_sequences_auto_scales_num_groups(spark, monkeypatch):
    """r12 VERDICT #2: a defaulted num_groups derives from the row
    count so a group's pandas payload stays bounded; an explicit
    num_groups pins the assignment bit-identically."""
    import wikiextractor_spark.operators.packing as pk

    rows = [(i, 5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # force the threshold low: 200 rows / 2 per group → 100 groups
    monkeypatch.setattr(pk, "_FFD_ROWS_PER_GROUP", 2)
    out = pk.pack_sequences(df, budget=100).collect()
    groups = {r["pack_id"] >> 32 for r in out}
    assert max(groups) >= pk._MIN_GROUPS  # genuinely above the floor
    assert all(0 <= g < 100 for g in groups)
    # below the threshold the floor holds
    monkeypatch.setattr(pk, "_FFD_ROWS_PER_GROUP", 32_000_000)
    out_floor = pk.pack_sequences(df, budget=100).collect()
    assert {r["pack_id"] >> 32 for r in out_floor} <= set(range(64))
    # explicit num_groups: two runs are bit-identical
    a = sorted(
        (r["doc_id"], r["pack_id"])
        for r in pk.pack_sequences(df, budget=100, num_groups=7).collect()
    )
    b = sorted(
        (r["doc_id"], r["pack_id"])
        for r in pk.pack_sequences(df, budget=100, num_groups=7).collect()
    )
    assert a == b


def test_assemble_packs_null_raise_releases_checkpoint(spark):
    """r12 ADVICE → r13: the NULL guard rides the cost projection
    (zero extra pass in the common case); when it fires during the
    result materialization, the input checkpoint just created must be
    released, not leaked."""
    sc = spark.sparkContext

    def cached_ids():
        return {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    before = cached_ids()
    with pytest.raises(Exception, match="NULL token_ids"):
        assemble_packs(
            _ids_df(spark, [(1, [1, 2]), (2, None)]),
            budget=8, num_groups=1,
        )
    leaked = cached_ids() - before
    assert leaked == set(), f"leaked checkpoint RDD blocks: {leaked}"


def test_prepare_corpus_normalize_and_sentence_spans(spark):
    """The r13 text-mutation stages compose in the pipeline: NFC
    collapses composed/decomposed twins BEFORE dedup keys form, and
    the C4 sentence-span stage removes repeated spans (keep-first)
    with fully-emptied docs dropped."""
    from wikiextractor_spark.operators.corpus import prepare_corpus

    docs = spark.createDataFrame(
        [
            (1, "café menu"),      # decomposed twin of 2
            (2, "café menu"),
            (3, "unique content here"),
        ],
        "doc_id long, text string",
    )
    out = prepare_corpus(
        docs, dedup="exact", normalize_form="NFC"
    ).collect()
    assert len(out) == 2  # the twins collapsed
    assert {r["doc_id"] for r in out} == {1, 3}

    span = "alpha one. beta two. gamma three."
    docs2 = spark.createDataFrame(
        [
            (1, "intro. " + span),
            (2, span),                  # becomes empty -> dropped
            (3, "other words entirely."),
        ],
        "doc_id long, text string",
    )
    out2 = {
        r["doc_id"]: r["text"]
        for r in prepare_corpus(
            docs2, dedup=None, sentence_span_min_count=2
        ).collect()
    }
    assert set(out2) == {1, 3}
    assert "alpha one." in out2[1]
