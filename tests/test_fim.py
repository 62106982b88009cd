"""FIM transformation (operators/fim.py): differential against a
pure-Python restatement of the md5 gate/cuts, structural invariants
(original stream reassembles from the parts), pass-through fidelity,
contract errors, and the scan-speed plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.operators.fim import fim_transform

PRE, MID, SUF = 1000, 1001, 1002


def _bucket(key, salt):
    h = hashlib.md5((str(key) + salt).encode()).hexdigest()
    return int(h[:8], 16) % 1_000_000


def _u60(key, salt):
    """sampling._hash_u60 restated: full-width 60-bit md5 draw (r13,
    the cut derivation)."""
    h = hashlib.md5((str(key) + salt).encode()).hexdigest()
    return int(h[:15], 16)


def _py_fim(doc_id, ids, rate, salt="fim", spm=False):
    if ids is None:
        return None
    if _bucket(doc_id, salt) >= round(rate * 1_000_000):
        return list(ids)
    n = len(ids)
    h1 = _u60(doc_id, salt + ":c1") % (n + 1)
    h2 = _u60(doc_id, salt + ":c2") % (n + 1)
    c1, c2 = min(h1, h2), max(h1, h2)
    pre, mid, suf = ids[:c1], ids[c1:c2], ids[c2:]
    if spm:
        return [PRE, SUF] + suf + [MID] + pre + mid
    return [PRE] + pre + [SUF] + suf + [MID] + mid


@pytest.fixture(scope="module")
def ids_df(spark):
    rows = [(i, [100 + i * 10 + j for j in range(i % 9)]) for i in range(60)]
    rows.append((999, None))
    return spark.createDataFrame(rows, "doc_id long, token_ids array<long>")


@pytest.mark.parametrize("spm", [False, True])
def test_fim_differential(spark, ids_df, spm):
    got = {
        r["doc_id"]: (None if r["token_ids"] is None else list(r["token_ids"]))
        for r in fim_transform(
            ids_df, prefix_id=PRE, middle_id=MID, suffix_id=SUF,
            fim_rate=0.5, spm=spm,
        ).collect()
    }
    src = {r["doc_id"]: r["token_ids"] for r in ids_df.collect()}
    transformed = 0
    for d, ids in src.items():
        expect = _py_fim(d, ids, 0.5, spm=spm)
        assert got[d] == expect, (d, got[d], expect)
        if ids is not None and expect != list(ids):
            transformed += 1
    assert 0 < transformed < len(src) - 1  # the gate genuinely splits


def test_fim_structure_and_reassembly(spark, ids_df):
    """Transformed streams carry exactly the three sentinels and the
    original ids: stripping sentinels and re-ordering PSM parts
    reproduces the source stream."""
    out = {
        r["doc_id"]: list(r["token_ids"])
        for r in fim_transform(
            ids_df.filter("token_ids IS NOT NULL"),
            prefix_id=PRE, middle_id=MID, suffix_id=SUF, fim_rate=1.0,
        ).collect()
    }
    src = {
        r["doc_id"]: list(r["token_ids"])
        for r in ids_df.filter("token_ids IS NOT NULL").collect()
    }
    for d, ids in out.items():
        assert ids[0] == PRE
        i_suf = ids.index(SUF)
        i_mid = ids.index(MID)
        pre = ids[1:i_suf]
        suf = ids[i_suf + 1:i_mid]
        mid = ids[i_mid + 1:]
        assert pre + mid + suf == src[d]
        # exactly three sentinels, streams grow by exactly 3
        assert len(ids) == len(src[d]) + 3


def test_fim_rate_zero_is_identity_and_null_passthrough(spark, ids_df):
    out = {
        r["doc_id"]: (None if r["token_ids"] is None else list(r["token_ids"]))
        for r in fim_transform(
            ids_df, prefix_id=PRE, middle_id=MID, suffix_id=SUF,
            fim_rate=0.0,
        ).collect()
    }
    for r in ids_df.collect():
        want = None if r["token_ids"] is None else list(r["token_ids"])
        assert out[r["doc_id"]] == want
    # NULL stays NULL at rate 1.0 too
    full = fim_transform(
        ids_df, prefix_id=PRE, middle_id=MID, suffix_id=SUF, fim_rate=1.0,
    )
    assert full.filter("doc_id = 999").first()["token_ids"] is None


def test_fim_contract_errors(spark, ids_df):
    with pytest.raises(ValueError, match="negative"):
        fim_transform(
            ids_df, prefix_id=-1, middle_id=MID, suffix_id=SUF
        )
    with pytest.raises(ValueError, match="distinct"):
        fim_transform(
            ids_df, prefix_id=PRE, middle_id=PRE, suffix_id=SUF
        )
    with pytest.raises(ValueError, match="fim_rate"):
        fim_transform(
            ids_df, prefix_id=PRE, middle_id=MID, suffix_id=SUF,
            fim_rate=1.5,
        )


def test_fim_plan_shape(spark, ids_df):
    out = fim_transform(
        ids_df, prefix_id=PRE, middle_id=MID, suffix_id=SUF
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_fim_chains_into_packs(spark, ids_df):
    """Composes into the emit path: FIM → assemble_packs, budgets
    honoring the +3 sentinel growth."""
    from wikiextractor_spark.operators.packing import assemble_packs

    fimmed = fim_transform(
        ids_df.filter("token_ids IS NOT NULL"),
        prefix_id=PRE, middle_id=MID, suffix_id=SUF, fim_rate=1.0,
    )
    packs = assemble_packs(fimmed, budget=64, num_groups=1, sep_id=0)
    rows = packs.collect()
    assert all(r["n_tokens"] <= 64 for r in rows if not r["over_budget"])
    total = sum(r["n_tokens"] for r in rows)
    n_docs = ids_df.filter("token_ids IS NOT NULL").count()
    src_tokens = sum(
        len(r["token_ids"])
        for r in ids_df.filter("token_ids IS NOT NULL").collect()
    )
    # every stream grew by 3 sentinels, plus one separator per doc
    assert total == src_tokens + 4 * n_docs


def test_fim_cuts_reach_beyond_bucket_width(spark):
    """r12 VERDICT #1: the old 1e6-bucket cut derivation confined both
    cuts to the first million positions of any longer stream.  With
    the r13 full-width draw, a >1M-token stream gets cuts anywhere in
    [0, n] — verified against the Python restatement on a doc id whose
    cuts BOTH land beyond the old bucket width."""
    n = 1_500_000
    did = next(
        i for i in range(2000)
        if _bucket(i, "fim") < 500_000
        and min(
            _u60(i, "fim:c1") % (n + 1), _u60(i, "fim:c2") % (n + 1)
        ) > 1_000_000
    )
    h1 = _u60(did, "fim:c1") % (n + 1)
    h2 = _u60(did, "fim:c2") % (n + 1)
    c1, c2 = min(h1, h2), max(h1, h2)
    assert c1 > 1_000_000  # unreachable under the r12 derivation

    df = spark.range(1).select(
        F.lit(did).cast("long").alias("doc_id"),
        F.sequence(F.lit(0), F.lit(n - 1)).cast("array<long>").alias(
            "token_ids"
        ),
    )
    out = list(
        fim_transform(
            df, prefix_id=PRE, middle_id=MID, suffix_id=SUF, fim_rate=0.5
        ).first()["token_ids"]
    )
    # PSM: [PRE] ids[:c1] [SUF] ids[c2:] [MID] ids[c1:c2] — ids are
    # 0..n-1, so each part's boundary values pin the cut positions
    assert len(out) == n + 3
    assert out[0] == PRE
    assert out[c1 + 1] == SUF
    assert out[c1 + 2 + (n - c2)] == MID
    if c1 > 0:
        assert out[c1] == c1 - 1          # last of prefix
    if c2 < n:
        assert out[c1 + 2] == c2          # first of suffix
    if c2 > c1:
        assert out[c1 + 3 + (n - c2)] == c1  # first of middle


# ---------------------------------------------------------------------------
# Character-grain FIM (r13): fim_transform_text
# ---------------------------------------------------------------------------

from wikiextractor_spark.operators.fim import fim_transform_text

PT, MT, ST = "<|fim_prefix|>", "<|fim_middle|>", "<|fim_suffix|>"


def _py_fim_text(doc_id, text, rate, salt="fimc", spm=False):
    if text is None:
        return None
    if _bucket(doc_id, salt) >= round(rate * 1_000_000):
        return text
    n = len(text)
    h1 = _u60(doc_id, salt + ":c1") % (n + 1)
    h2 = _u60(doc_id, salt + ":c2") % (n + 1)
    c1, c2 = min(h1, h2), max(h1, h2)
    pre, mid, suf = text[:c1], text[c1:c2], text[c2:]
    if spm:
        return PT + ST + suf + MT + pre + mid
    return PT + pre + ST + suf + MT + mid


@pytest.mark.parametrize("spm", [False, True])
def test_fim_text_differential(spark, spm):
    texts = [(i, f"the quick brown fox {i} jumps over") for i in range(40)]
    texts.append((999, None))
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in fim_transform_text(df, fim_rate=0.5, spm=spm).collect()
    }
    transformed = 0
    for d, t in texts:
        expect = _py_fim_text(d, t, 0.5, spm=spm)
        assert got[d] == expect, (d, got[d], expect)
        if t is not None and expect != t:
            transformed += 1
    assert 0 < transformed < len(texts) - 1


def test_fim_text_composes_with_special_tokens(spark):
    """The stated pipeline: char-grain FIM in text space, then
    bpe_token_ids with the markers as special tokens — the stream is
    [PRE] ids(prefix) [SUF] ids(suffix) [MID] ids(middle), each piece
    tokenized SEPARATELY."""
    from wikiextractor_spark.functions.tokenizer import (
        GPT2_PRETOKENIZER_PATTERN,
        bpe_token_ids,
        vocab_from_tokens,
    )

    # vocab in the byte space: merges fuse 'th'+'e' so a cut inside
    # "the" forces a different segmentation than the unsplit text
    vocab = vocab_from_tokens(
        spark,
        ["th", "the", "t", "h", "e", "a", "b", "Ġ", "Ġt", "Ġth", "Ġthe"],
        1.0,
    )
    merges = {("t", "h"): 0.0, ("th", "e"): 1.0, ("Ġ", "t"): 2.0,
              ("Ġt", "h"): 3.0, ("Ġth", "e"): 4.0}
    specials = {PT: 9001, MT: 9002, ST: 9003}

    # find a gated doc and compute its cuts over this text
    text = "the the the"
    did = next(i for i in range(500) if _bucket(i, "fimc") < 500_000)
    n = len(text)
    h1 = _u60(did, "fimc:c1") % (n + 1)
    h2 = _u60(did, "fimc:c2") % (n + 1)
    c1, c2 = min(h1, h2), max(h1, h2)

    df = spark.createDataFrame([(did, text)], "doc_id long, text string")
    fimmed = fim_transform_text(df, fim_rate=0.5)
    ids = list(
        bpe_token_ids(
            fimmed, vocab, merges,
            byte_level=True, pre_tokenizer=GPT2_PRETOKENIZER_PATTERN,
            special_tokens=specials, out_col="token_ids",
        ).first()["token_ids"]
    )

    def piece_ids(piece):
        if not piece:
            return []
        sub = spark.createDataFrame([(0, piece)], "doc_id long, text string")
        return list(
            bpe_token_ids(
                sub, vocab, merges,
                byte_level=True, pre_tokenizer=GPT2_PRETOKENIZER_PATTERN,
                out_col="token_ids",
            ).first()["token_ids"]
        )

    expect = (
        [9001] + piece_ids(text[:c1]) + [9003] + piece_ids(text[c2:])
        + [9002] + piece_ids(text[c1:c2])
    )
    assert ids == expect, (c1, c2, ids, expect)


def test_fim_text_contract_errors(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        fim_transform_text(df, prefix_tok="")
    with pytest.raises(ValueError, match="distinct"):
        fim_transform_text(df, prefix_tok=MT)
    with pytest.raises(ValueError, match="fim_rate"):
        fim_transform_text(df, fim_rate=-0.1)


def test_fim_text_plan_shape(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    out = fim_transform_text(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_fim_text_empty_and_edge_cuts(spark):
    """The n=0 boundary of the mod-(n+1) derivation: an EMPTY gated
    text becomes markers-only; an ungated empty text passes through —
    pinned differentially like the token-grain empty-array rows."""
    gated = next(i for i in range(500) if _bucket(i, "fimc") < 500_000)
    ungated = next(i for i in range(500) if _bucket(i, "fimc") >= 500_000)
    df = spark.createDataFrame(
        [(gated, ""), (ungated, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in fim_transform_text(df, fim_rate=0.5).collect()
    }
    assert got[gated] == PT + ST + MT  # both cuts are 0: empty parts
    assert got[ungated] == ""
    for d in (gated, ungated):
        assert got[d] == _py_fim_text(d, "", 0.5)
