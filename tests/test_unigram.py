"""Unigram-LM Viterbi serving (functions/unigram.py): differential
against an independent memoized-recursion restatement AND exhaustive
segmentation enumeration, divergence vs the greedy BPE grain,
artifact round trips, and contract errors."""

from __future__ import annotations

import random
from functools import lru_cache

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.functions.unigram import (
    _TIE_BASE,
    _quantize_micro,
    _viterbi_count_word,
    load_unigram_lm,
    save_unigram_lm,
    unigram_from_tokens,
    unigram_token_count,
)

LM = {
    "the": -2.0, "and": -2.5, "ing": -2.8, "tion": -3.0,
    "er": -3.2, "in": -3.1, "on": -3.4, "an": -3.45, "th": -3.9,
    "he": -3.95, "lo": -3.0, "low": -3.6, "lower": -4.2,
    "a": -4.0, "e": -3.98, "i": -4.1, "o": -4.15, "u": -4.3,
    "s": -4.2, "t": -4.05, "n": -4.12, "r": -4.25, "l": -4.35,
    "d": -4.4, "h": -4.45, "w": -4.7, "g": -4.65,
}
UNK = -10.0


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _brute_best(word: str, micro: dict[str, int], unk: int) -> int:
    """Independent restatement: memoized recursion over suffixes,
    probing every substring (no length-list structure)."""

    @lru_cache(maxsize=None)
    def best(i: int) -> int:
        if i == len(word):
            return 0
        # unk only where no single-char vocab token covers the char
        cands = (
            [] if word[i] in micro
            else [best(i + 1) + unk * _TIE_BASE - 1]
        )
        for j in range(i + 1, len(word) + 1):
            m = micro.get(word[i:j])
            if m is not None:
                cands.append(best(j) + m * _TIE_BASE - 1)
        return max(cands)

    return best(0)


def _enum_best(word: str, micro: dict[str, int], unk: int) -> int:
    """Exhaustive enumeration over all 2^(n-1) segmentations; a piece
    is legal iff it is a vocab token or a single (unk) character."""
    n = len(word)
    best = None
    for mask in range(1 << max(0, n - 1)):
        cuts = [0] + [
            i + 1 for i in range(n - 1) if mask >> i & 1
        ] + [n]
        packed = 0
        ok = True
        for a, b in zip(cuts, cuts[1:]):
            piece = word[a:b]
            m = micro.get(piece)
            if m is None:
                if len(piece) != 1:
                    ok = False
                    break
                m = unk
            packed += m * _TIE_BASE - 1
        if ok and (best is None or packed > best):
            best = packed
    assert best is not None  # single-char unk makes every word legal
    return best


def test_viterbi_vs_enumeration_and_recursion():
    micro = {t: _quantize_micro(v) for t, v in LM.items()}
    unk = _quantize_micro(UNK)
    lens = tuple(sorted({len(t) for t in micro}))
    rng = random.Random(13)
    words = [
        "the", "there", "lower", "lowering", "qqq", "xyzzy", "a",
        "thething", "onion", "intention",
    ] + [
        "".join(rng.choice("theloqj") for _ in range(rng.randint(1, 9)))
        for _ in range(150)
    ]
    for w in words:
        got = _viterbi_count_word(
            w, tok_micro=micro, lens=lens, unk_micro=unk
        )
        b1 = _brute_best(w, micro, unk)
        assert got == float(_TIE_BASE - (b1 % _TIE_BASE)), w
        if len(w) <= 10:
            b2 = _enum_best(w, micro, unk)
            assert b1 == b2, w


def test_unigram_kernel_differential_on_real_docs(spark, docs):
    """The Spark kernel vs the independent per-word recursion over
    real corpus documents (includes j/q words — the UNK path)."""
    lm = unigram_from_tokens(spark, LM, UNK)
    sample = docs.limit(60).select("doc_id", "text")
    out = {
        r["doc_id"]: r["n"]
        for r in unigram_token_count(sample, lm, out_col="n").collect()
    }
    micro = {t: _quantize_micro(v) for t, v in LM.items()}
    unk = _quantize_micro(UNK)
    for r in sample.collect():
        if r["text"] is None:
            assert out[r["doc_id"]] is None
            continue
        want = 0.0
        for w in r["text"].split(" "):
            if w:
                b = _brute_best(w, micro, unk)
                want += _TIE_BASE - (b % _TIE_BASE)
        assert out[r["doc_id"]] == want, r["doc_id"]


def test_unigram_diverges_from_greedy_bpe_grain(spark):
    """The published divergence: greedy longest-match always commits
    to the longest vocab hit; Viterbi picks the max-logprob
    segmentation.  With 'the' scored far below 'th'+'e', the unigram
    count is 2 where greedy counts 1 — pack budgets for unigram-LM
    models NEED this kernel."""
    from wikiextractor_spark.functions.tokenizer import (
        bpe_token_count,
        vocab_from_tokens,
    )

    df = spark.createDataFrame([(0, "the")], "doc_id long, text string")
    lm = unigram_from_tokens(
        spark, {"the": -9.0, "th": -1.0, "e": -1.0, "t": -2.0, "h": -2.0},
        UNK,
    )
    uni = unigram_token_count(df, lm, out_col="n").first()["n"]
    assert uni == 2.0  # th + e beats the
    vocab = vocab_from_tokens(spark, ["the", "th", "e", "t", "h"], 1.0)
    greedy = bpe_token_count(df, vocab, out_col="n").first()["n"]
    assert greedy == 1.0
    assert uni != greedy


def test_unigram_artifact_round_trip(spark, tmp_path):
    lm = unigram_from_tokens(spark, LM, UNK)
    save_unigram_lm(lm, str(tmp_path / "lm"))
    loaded = load_unigram_lm(spark, str(tmp_path / "lm"))
    df = spark.createDataFrame(
        [(0, "the lower onion"), (1, None)], "doc_id long, text string"
    )
    a = unigram_token_count(df, lm, out_col="n").collect()
    b = unigram_token_count(df, loaded, out_col="n").collect()
    assert sorted((r["doc_id"], r["n"]) for r in a) == sorted(
        (r["doc_id"], r["n"]) for r in b
    )
    assert dict((r["doc_id"], r["n"]) for r in a)[1] is None
    # TSV: the unk scalar must arrive as the argument
    tsv = tmp_path / "lm.tsv"
    tsv.write_text("".join(f"{t}\t{v}\n" for t, v in LM.items()))
    loaded_tsv = load_unigram_lm(spark, str(tsv), unk_logprob=UNK)
    c = unigram_token_count(df, loaded_tsv, out_col="n").collect()
    assert sorted((r["doc_id"], r["n"]) for r in c) == sorted(
        (r["doc_id"], r["n"]) for r in a
    )


def test_unigram_contract_errors(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    # missing unk row
    no_unk = spark.createDataFrame([("a", -1.0)], "token string, logprob double")
    with pytest.raises(ValueError, match="unk_logprob row"):
        unigram_token_count(df, no_unk)
    # whitespace-carrying token
    with pytest.raises(ValueError, match="whitespace"):
        unigram_from_tokens(spark, {"a b": -1.0}, UNK)
    # non-numeric logprob
    with pytest.raises(ValueError, match="non-numeric"):
        unigram_from_tokens(spark, {"a": "x"}, UNK)
    # duplicate tokens (hand-built frame)
    dup = spark.createDataFrame(
        [("a", -1.0), ("a", -2.0), (None, UNK)],
        "token string, logprob double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        unigram_token_count(df, dup)
    # NULL logprob on a real token
    bad = spark.createDataFrame(
        [("a", None), (None, UNK)], "token string, logprob double"
    )
    with pytest.raises(ValueError, match="NULL or non-finite"):
        unigram_token_count(df, bad)


def test_unigram_long_word_guard(spark):
    """A single word at the tie-break bound raises (raise-don't-
    miscount); the longest legal word still counts."""
    lm = unigram_from_tokens(spark, {"a": -1.0}, UNK)
    ok = spark.createDataFrame(
        [(0, "a" * (_TIE_BASE - 1))], "doc_id long, text string"
    )
    got = unigram_token_count(ok, lm, out_col="n").first()["n"]
    assert got == float(_TIE_BASE - 1)
    too_long = spark.createDataFrame(
        [(0, "a" * _TIE_BASE)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="exceeds"):
        unigram_token_count(too_long, lm, out_col="n").collect()


def test_unigram_feeds_pack_budgets(spark):
    """The counting column composes into pack_sequences via token_col
    — the stated purpose (faithful budgets for unigram-LM models)."""
    from wikiextractor_spark.operators.packing import pack_sequences

    lm = unigram_from_tokens(spark, LM, UNK)
    df = spark.createDataFrame(
        [(i, "the lower onion and the thing") for i in range(8)],
        "doc_id long, text string",
    )
    counted = unigram_token_count(df, lm, out_col="nt").withColumn(
        "nt", F.col("nt").cast("long")
    )
    packed = pack_sequences(
        counted, token_col="nt", budget=32, num_groups=1
    ).collect()
    assert all(not r["over_budget"] for r in packed)
    per_pack: dict = {}
    for r in packed:
        per_pack.setdefault(r["pack_id"], 0)
        per_pack[r["pack_id"]] += r["nt"]
    assert all(v <= 32 for v in per_pack.values())


def test_unk_never_beats_a_covered_character(spark):
    """r13 review: a covered character always scores through its own
    token — a HIGH unk_logprob must not let known singletons take the
    unk rate (real SentencePiece serving would count 1 here)."""
    lm = unigram_from_tokens(
        spark, {"ab": -3.0, "a": -5.0, "b": -5.0}, unk_logprob=-1.0
    )
    df = spark.createDataFrame([(0, "ab qq")], "doc_id long, text string")
    got = unigram_token_count(df, lm, out_col="n").first()["n"]
    # 'ab' → the 1-token piece (-3.0 beats a+b = -10.0; unk is NOT a
    # candidate for covered a/b); 'qq' → 2 unk tokens
    assert got == 3.0


def test_unigram_rejects_non_finite_logprobs(spark):
    import math as _m

    with pytest.raises(ValueError, match="non-finite"):
        unigram_from_tokens(spark, {"a": _m.nan}, UNK)
    with pytest.raises(ValueError, match="not a finite"):
        unigram_from_tokens(spark, {"a": -1.0}, _m.inf)
    with pytest.raises(ValueError, match="not a finite"):
        unigram_from_tokens(spark, {"a": -1.0}, True)
    # a NaN riding a hand-built frame is caught at kernel build with
    # the offending token named, not a quantizer crash
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    bad = spark.createDataFrame(
        [("a", float("nan")), (None, UNK)], "token string, logprob double"
    )
    with pytest.raises(ValueError, match="non-finite"):
        unigram_token_count(df, bad)


def test_unigram_special_tokens_pre_split(spark):
    """Literal special-token text counts 1.0, split out before the
    whitespace grain — same added-token behavior as the BPE path."""
    lm = unigram_from_tokens(spark, LM, UNK)
    eot = "<|endoftext|>"
    df = spark.createDataFrame(
        [(0, f"the lower{eot}onion and"), (1, eot)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in unigram_token_count(
            df, lm, out_col="n", special_tokens={eot: 50256}
        ).collect()
    }
    micro = {t: _quantize_micro(v) for t, v in LM.items()}
    unk = _quantize_micro(UNK)

    def count(w):
        b = _brute_best(w, micro, unk)
        return _TIE_BASE - (b % _TIE_BASE)

    # segments tokenize independently around the marker
    want0 = (
        count("the") + count("lower") + 1.0 + count("onion")
        + count("and")
    )
    assert out[0] == want0
    assert out[1] == 1.0
    # without the mapping, the marker charges per-char unk/vocab costs
    plain = unigram_token_count(
        df.filter("doc_id = 1"), lm, out_col="n"
    ).first()["n"]
    assert plain > 1.0


# ---------------------------------------------------------------------------
# unigram_token_ids (r13 late): Viterbi ids with deterministic backtrack
# ---------------------------------------------------------------------------

from wikiextractor_spark.functions.unigram import unigram_token_ids


def _enum_ids(word, micro, unk, tid):
    """Exhaustive restatement of the ids contract: among segmentations
    achieving the max packed value, the backtrack's longest-token-
    first-from-the-end choice = max by (packed, lengths-from-end)."""
    n = len(word)
    best_key, best_ids = None, None
    for mask in range(1 << max(0, n - 1)):
        cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        packed, ids, ok = 0, [], True
        for a, b in zip(cuts, cuts[1:]):
            piece = word[a:b]
            m = micro.get(piece)
            if m is None:
                # unk: single UNCOVERED char only
                if len(piece) != 1 or piece in micro:
                    ok = False
                    break
                m, i = unk, -1
            else:
                i = tid[piece]
            packed += m * _TIE_BASE - 1
            ids.append((b - a, i))
        if not ok:
            continue
        key = (packed, tuple(ln for ln, _ in reversed(ids)))
        if best_key is None or key > best_key:
            best_key, best_ids = key, [i for _, i in ids]
    return best_ids


def test_unigram_ids_vs_enumeration():
    from wikiextractor_spark.functions.unigram import _viterbi_ids_word

    micro = {t: _quantize_micro(v) for t, v in LM.items()}
    unk = _quantize_micro(UNK)
    lens = tuple(sorted({len(t) for t in micro}))
    tid = {t: i for i, t in enumerate(sorted(LM))}
    rng = random.Random(7)
    words = ["the", "there", "lower", "onion", "qlotheq", "a", "jj"] + [
        "".join(rng.choice("theloqj") for _ in range(rng.randint(1, 9)))
        for _ in range(120)
    ]
    for w in words:
        got = _viterbi_ids_word(
            w, tok_micro=micro, lens=lens, unk_micro=unk, tok_ids=tid
        )
        want = _enum_ids(w, micro, unk, tid)
        assert got == want, (w, got, want)


def test_unigram_ids_kernel_and_count_consistency(spark, docs):
    """size(ids) == unigram_token_count for every doc — both -1 and
    real ids count 1 under this grain (the enumeration differential
    for id CONTENT lives in test_unigram_ids_vs_enumeration)."""
    lm = unigram_from_tokens(spark, LM, UNK)
    sample = docs.limit(40).select("doc_id", "text")
    out = unigram_token_ids(sample, lm, out_col="ids")
    out = unigram_token_count(out, lm, out_col="n")
    for r in out.collect():
        assert float(len(r["ids"])) == r["n"], r["doc_id"]


def test_unigram_ids_explicit_mapping_and_specials(spark):
    lm = unigram_from_tokens(
        spark, {"ab": -1.0, "a": -2.0, "b": -2.0}, UNK
    )
    df = spark.createDataFrame(
        [(0, "ab a<|s|>b q")], "doc_id long, text string"
    )
    ids = list(
        unigram_token_ids(
            df, lm, out_col="ids",
            token_ids={"ab": 7, "a": 8, "b": 9},
            special_tokens={"<|s|>": 100},
        ).first()["ids"]
    )
    # 'ab'→[7]; 'a'→[8]; special→100; 'b'→[9]; 'q' uncovered→-1
    assert ids == [7, 8, 100, 9, -1]
    # mapping must cover the LM exactly
    with pytest.raises(ValueError, match="cover the LM"):
        unigram_token_ids(df, lm, token_ids={"ab": 7})
    with pytest.raises(ValueError, match="duplicate vocab id"):
        unigram_token_ids(
            df, lm, token_ids={"ab": 7, "a": 7, "b": 9}
        )
    with pytest.raises(ValueError, match="collides"):
        unigram_token_ids(
            df, lm, token_ids={"ab": 7, "a": 8, "b": 9},
            special_tokens={"<|s|>": 7},
        )


def test_unigram_ids_feed_packs(spark):
    """The Llama-class emit path: unigram ids → assemble_packs with
    the separator registered — budgets faithful at this grain."""
    from wikiextractor_spark.operators.packing import assemble_packs

    lm = unigram_from_tokens(spark, LM, UNK)
    df = spark.createDataFrame(
        [(i, "the lower onion and the thing") for i in range(6)],
        "doc_id long, text string",
    )
    ids = unigram_token_ids(df, lm, out_col="token_ids")
    packs = assemble_packs(
        ids.select("doc_id", "token_ids"), budget=64, num_groups=1,
        sep_id=50256,
    ).collect()
    assert all(r["n_tokens"] <= 64 for r in packs if not r["over_budget"])
    n = unigram_token_count(df, lm, out_col="n").agg(
        F.sum("n")
    ).first()[0]
    assert sum(r["n_tokens"] for r in packs) == n + 6  # + separators


def test_oversize_word_chars_fallback(spark):
    """r13 final review: one unbroken >=1024-char blob must not abort
    a corpus-scale job — oversize_word='chars' quarantines such words
    at the per-character grain (count = len; ids = single-char id or
    -1), while the default still raises."""
    lm = unigram_from_tokens(spark, {"a": -1.0, "ab": -0.5}, UNK)
    blob = "ab" * 600 + "q"  # 1201 chars, q uncovered
    df = spark.createDataFrame(
        [(0, f"the {blob} end"), (1, "ab")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="exceeds"):
        unigram_token_count(df, lm, out_col="n").collect()
    got = {
        r["doc_id"]: r["n"]
        for r in unigram_token_count(
            df, lm, out_col="n", oversize_word="chars"
        ).collect()
    }
    # blob: per-char 1201; 'the'/'end': normal DP (all uncovered
    # chars except... t/h/e/n/d uncovered → unk 1 each = 3 + 3)
    assert got[0] == 1201 + 3 + 3
    assert got[1] == 1.0  # normal words still run the real DP
    ids = {
        r["doc_id"]: list(r["ids"])
        for r in unigram_token_ids(
            df, lm, out_col="ids", oversize_word="chars"
        ).collect()
    }
    # blob ids: 'a' has a single-char token (lexicographic id 0),
    # 'b' and 'q' do not → -1; normal word 'ab' takes the real
    # Viterbi (token 'ab', id 1)
    assert ids[1] == [1]
    blob_ids = ids[0][3:-3]  # strip 'the' and 'end' per-char unks
    assert len(blob_ids) == 1201
    assert blob_ids[0] == 0 and blob_ids[1] == -1 and blob_ids[-1] == -1
    # size(ids) == count holds through the fallback
    assert len(ids[0]) == got[0]
    with pytest.raises(ValueError, match="oversize_word"):
        unigram_token_count(df, lm, oversize_word="truncate")


# --------------------------------------------------------------------------
# unigram_decode_ids (r14): the decode leg of the triangle
# --------------------------------------------------------------------------

def test_unigram_decode_round_trip_and_lossiness(spark):
    from wikiextractor_spark.functions.unigram import (
        unigram_decode_ids,
        unigram_token_ids,
    )

    lm = unigram_from_tokens(spark, LM, UNK)
    df = spark.createDataFrame(
        [(0, "lowering"), (1, "the lower onion"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    enc = unigram_token_ids(df, lm, out_col="ids")
    got = {
        r["doc_id"]: r["dec"]
        for r in unigram_decode_ids(
            enc, lm, ids_col="ids", out_col="dec"
        ).collect()
    }
    # a fully-covered single WORD round-trips exactly
    assert got[0] == "lowering"
    # multi-word text decodes space-stripped (whitespace consumed at
    # encode time — the stated plain-grain lossiness)
    assert got[1] == "theloweronion"
    assert got[2] == ""
    assert got[3] is None


def test_unigram_decode_specials_unk_and_errors(spark):
    from wikiextractor_spark.functions.unigram import (
        unigram_decode_ids,
        unigram_token_ids,
    )

    lm = unigram_from_tokens(spark, {"ab": -1.0, "a": -2.0, "b": -2.0}, UNK)
    tids = {"ab": 7, "a": 8, "b": 9}
    sp = {"<|s|>": 100}
    df = spark.createDataFrame(
        [(0, "ab a<|s|>b q")], "doc_id long, text string"
    )
    enc = unigram_token_ids(
        df, lm, out_col="ids", token_ids=tids, special_tokens=sp
    )
    # ids = [7, 8, 100, 9, -1]: specials verbatim, -1 -> oov_char
    dec = unigram_decode_ids(
        enc, lm, ids_col="ids", out_col="dec",
        token_ids=tids, special_tokens=sp,
    ).first()["dec"]
    assert dec == "aba<|s|>b?"
    # custom oov_char
    dec2 = unigram_decode_ids(
        enc, lm, ids_col="ids", out_col="dec",
        token_ids=tids, special_tokens=sp, oov_char="~",
    ).first()["dec"]
    assert dec2 == "aba<|s|>b~"
    # an UNREGISTERED sentinel id raises, naming this kernel
    with pytest.raises(Exception, match="unigram_decode_ids"):
        unigram_decode_ids(
            enc, lm, ids_col="ids", out_col="dec", token_ids=tids
        ).collect()
    # id-derivation contract is the shared encode rule
    with pytest.raises(ValueError, match="cover the LM"):
        unigram_decode_ids(enc, lm, ids_col="ids", token_ids={"ab": 7})
    with pytest.raises(ValueError, match="oov_char"):
        unigram_decode_ids(enc, lm, ids_col="ids", oov_char="??")
    # default lexicographic numbering decodes the default encoding:
    # without specials the marker's characters are per-char unks —
    # 'ab' + 'a' + 5 unks + 'b' + 1 unk for the uncovered 'q'
    enc_d = unigram_token_ids(df, lm, out_col="ids")
    dec_d = unigram_decode_ids(
        enc_d, lm, ids_col="ids", out_col="dec"
    ).first()["dec"]
    assert dec_d == "aba?????b?"


# --------------------------------------------------------------------------
# SentencePiece space-marker mode (r14): real-artifact fidelity
# --------------------------------------------------------------------------

SP_LM = {
    "▁the": -2.0, "▁cat": -2.5, "▁ca": -4.0,
    "▁": -6.0, "t": -4.5, "h": -4.6, "e": -4.4, "c": -4.7,
    "a": -4.3, "s": -4.2,
}


def test_sp_marker_matches_real_artifact_pieces(spark):
    """A real SentencePiece-shaped artifact (▁-marked pieces) is
    unmatchable at the plain whitespace grain — every word degrades
    to char/unk streams — and serves faithfully under
    space_marker='▁', with the published detokenization making the
    round trip EXACT."""
    from wikiextractor_spark.functions.unigram import (
        unigram_decode_ids,
        unigram_token_ids,
    )

    lm = unigram_from_tokens(spark, SP_LM, UNK)
    df = spark.createDataFrame(
        [(0, "the cat"), (1, "cats the"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    ids_sorted = {t: i for i, t in enumerate(sorted(SP_LM))}
    plain = unigram_token_ids(df, lm, out_col="ids").collect()
    marked = unigram_token_ids(
        df, lm, out_col="ids", space_marker="▁"
    ).collect()
    p = {r["doc_id"]: (None if r["ids"] is None else list(r["ids"]))
         for r in plain}
    m = {r["doc_id"]: (None if r["ids"] is None else list(r["ids"]))
         for r in marked}
    # plain grain: '▁the' can never match the bare word 'the' — it
    # segments via singles; marked grain: one piece per word
    assert m[0] == [ids_sorted["▁the"], ids_sorted["▁cat"]]
    assert len(p[0]) > 2
    # 'cats' = ▁cat + s (word-internal continuation piece)
    assert m[1][:2] == [ids_sorted["▁cat"], ids_sorted["s"]]
    assert m[2] == [] and m[3] is None
    # the published detokenization: EXACT round trip
    enc = unigram_token_ids(
        df, lm, out_col="ids", space_marker="▁"
    )
    dec = {
        r["doc_id"]: r["dec"]
        for r in unigram_decode_ids(
            enc, lm, ids_col="ids", out_col="dec",
            space_marker="▁",
        ).collect()
    }
    assert dec[0] == "the cat"
    assert dec[1] == "cats the"
    assert dec[2] == "" and dec[3] is None


def test_sp_marker_count_ids_consistency_and_differential():
    """The marker is a plain DP prefix: count/ids under
    prefix='▁' equal the brute-force enumeration over the
    prefixed word."""
    from wikiextractor_spark.functions.unigram import (
        _viterbi_count_word,
        _viterbi_ids_word,
    )

    micro = {t: _quantize_micro(v) for t, v in SP_LM.items()}
    lens = tuple(sorted({len(t) for t in micro}))
    unk = _quantize_micro(UNK)
    ids = {t: i for i, t in enumerate(sorted(SP_LM))}
    for w in ("the", "cat", "cats", "xx", "chat", "a"):
        got = _viterbi_count_word(
            w, micro, lens, unk, prefix="▁"
        )
        best = _brute_best("▁" + w, micro, unk)
        exp = float(_TIE_BASE - (best % _TIE_BASE))
        assert got == exp, w
        seq = _viterbi_ids_word(
            w, micro, lens, unk, ids, prefix="▁"
        )
        assert len(seq) == got, w


def test_sp_marker_contract_errors(spark):
    from wikiextractor_spark.functions.unigram import (
        unigram_decode_ids,
        unigram_token_ids,
    )

    lm = unigram_from_tokens(spark, SP_LM, UNK)
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    for bad in ("", " ", "a b", 7):
        with pytest.raises(ValueError, match="space_marker"):
            unigram_token_count(df, lm, space_marker=bad)
        with pytest.raises(ValueError, match="space_marker"):
            unigram_token_ids(df, lm, space_marker=bad)
        with pytest.raises(ValueError, match="space_marker"):
            unigram_decode_ids(df, lm, ids_col="doc_id",
                               space_marker=bad)


def test_sp_marker_decode_rejects_marker_carrying_texts(spark):
    """r15 (r14 ADVICE): the decode-side marker→space rewrite runs
    over the whole buffer, so a special text carrying the marker or
    an oov_char overlapping it would be silently rewritten — both
    reject at validation time, and the same texts stay LEGAL in
    plain (non-marker) mode."""
    from wikiextractor_spark.functions.unigram import (
        unigram_decode_ids,
    )

    lm = unigram_from_tokens(spark, {"▁foo": -2.0, "x": -3.0}, UNK)
    df = spark.createDataFrame(
        [(0, [0])], "doc_id long, ids array<long>"
    )
    with pytest.raises(ValueError, match="special-token"):
        unigram_decode_ids(
            df, lm, ids_col="ids", special_tokens={"<▁sep>": 100},
            space_marker="▁",
        )
    with pytest.raises(ValueError, match="oov_char"):
        unigram_decode_ids(
            df, lm, ids_col="ids", oov_char="▁", space_marker="▁",
        )
    # plain mode: the same inputs are fine (no rewrite exists);
    # lexicographic default ids: '▁' sorts after ASCII, so id 0 = 'x'
    out = unigram_decode_ids(
        df, lm, ids_col="ids", out_col="dec",
        special_tokens={"<▁sep>": 100}, oov_char="?",
    ).collect()
    assert out[0]["dec"] == "x"


def test_sp_marker_special_token_convention(spark):
    """Specials are word-boundary-like under the marker decode (r14
    review, stated): 'foo<s> bar' round-trips exactly; the unspaced
    'foo<s>bar' encodes to the SAME ids (the pre-split erases the
    spacing) and decodes to the spaced form."""
    from wikiextractor_spark.functions.unigram import (
        unigram_decode_ids,
        unigram_token_ids,
    )

    lm = unigram_from_tokens(
        spark, {"▁foo": -2.0, "▁bar": -2.0, "▁": -6.0}, UNK
    )
    sp = {"<s>": 100}
    df = spark.createDataFrame(
        [(0, "foo<s> bar"), (1, "foo<s>bar")],
        "doc_id long, text string",
    )
    enc = unigram_token_ids(
        df, lm, out_col="ids", special_tokens=sp, space_marker="▁"
    )
    rows = {r["doc_id"]: list(r["ids"]) for r in enc.collect()}
    assert rows[0] == rows[1]  # spacing info genuinely gone
    dec = {
        r["doc_id"]: r["dec"]
        for r in unigram_decode_ids(
            enc, lm, ids_col="ids", out_col="dec",
            special_tokens=sp, space_marker="▁",
        ).collect()
    }
    assert dec[0] == "foo<s> bar"  # exact round trip
    assert dec[1] == "foo<s> bar"  # the stated convention
