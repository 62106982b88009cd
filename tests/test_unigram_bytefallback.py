"""Unigram byte fallback (r16, functions/unigram.py): the published
SentencePiece/HF ``byte_fallback`` — an unknown character re-encodes
as its UTF-8 bytes' ``<0xNN>`` piece ids instead of the -1/unk
sentinel.  Differential vs an exhaustive independent enumeration
(multi-byte/emoji adversaria), ids/count consistency, the published
ByteFallback decode rule (valid runs → text, invalid runs → one
U+FFFD per byte), marker-mode composition, and the validation
contract."""

from __future__ import annotations

import random

import pytest

from wikiextractor_spark.functions.unigram import (
    _TIE_BASE,
    _quantize_micro,
    _viterbi_count_word,
    _viterbi_ids_word,
    unigram_decode_ids,
    unigram_from_tokens,
    unigram_token_count,
    unigram_token_ids,
)

LM = {
    "the": -2.0, "th": -2.2, "he": -2.3, "lo": -3.0,
    "t": -4.0, "h": -4.1, "e": -3.9, "l": -4.2, "o": -4.3,
}
UNK = -10.0
#: byte ids deliberately offset so they collide with nothing
FB = {b: 1000 + b for b in range(256)}
TID = {t: i for i, t in enumerate(sorted(LM))}

MICRO = {t: _quantize_micro(v) for t, v in LM.items()}
UNKM = _quantize_micro(UNK)
LENS = tuple(sorted({len(t) for t in MICRO}))


def _enum_ids_fb(word, micro, unk, tid, fb):
    """Exhaustive restatement with the byte-fallback emission: an
    uncovered single char charges ``unk`` score and its UTF-8 byte
    COUNT in the token term, emitting its bytes' ids; tie-break =
    the backtrack's longest-token-first-from-the-end rule."""
    n = len(word)
    best_key, best_ids = None, None
    for mask in range(1 << max(0, n - 1)):
        cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        packed, ids, ok = 0, [], True
        for a, b in zip(cuts, cuts[1:]):
            piece = word[a:b]
            m = micro.get(piece)
            if m is None:
                if len(piece) != 1 or piece in micro:
                    ok = False
                    break
                bs = piece.encode("utf-8")
                packed += unk * _TIE_BASE - len(bs)
                ids.append((1, [fb[x] for x in bs]))
            else:
                packed += m * _TIE_BASE - 1
                ids.append((b - a, [tid[piece]]))
        if not ok:
            continue
        key = (packed, tuple(ln for ln, _ in reversed(ids)))
        if best_key is None or key > best_key:
            best_key = key
            best_ids = [i for _, seq in ids for i in seq]
    return best_ids


def test_fallback_ids_vs_enumeration():
    rng = random.Random(29)
    words = [
        "the", "qqq", "él", "héllo", "😀", "the😀", "é", "✓th",
        "tßo", "ss",
    ] + [
        "".join(rng.choice("theloqé✓😀") for _ in range(rng.randint(1, 7)))
        for _ in range(150)
    ]
    for w in words:
        got = _viterbi_ids_word(
            w, tok_micro=MICRO, lens=LENS, unk_micro=UNKM,
            tok_ids=TID, fb_ids=FB,
        )
        want = _enum_ids_fb(w, MICRO, UNKM, TID, FB)
        assert got == want, (w, got, want)
        # the count kernel charges exactly what the ids kernel emits
        cnt = _viterbi_count_word(
            w, tok_micro=MICRO, lens=LENS, unk_micro=UNKM,
            byte_fallback=True,
        )
        assert cnt == float(len(got)), w


def test_fallback_never_changes_covered_segmentation():
    """Text the vocab fully covers segments identically with and
    without fallback (the lattice SCORE is untouched — only the unk
    emission changes)."""
    for w in ("the", "thethe", "hello", "tothe"):
        plain = _viterbi_ids_word(
            w, tok_micro=MICRO, lens=LENS, unk_micro=UNKM, tok_ids=TID
        )
        fb = _viterbi_ids_word(
            w, tok_micro=MICRO, lens=LENS, unk_micro=UNKM,
            tok_ids=TID, fb_ids=FB,
        )
        assert plain == fb, w


def test_fallback_matches_fused_run_bytes():
    """Per-character fallback == fused-run fallback: the byte stream
    of consecutive unknowns is the concatenation of each character's
    bytes, so the one stated unk-grain divergence vanishes."""
    got = _viterbi_ids_word(
        "éé😀", tok_micro=MICRO, lens=LENS, unk_micro=UNKM,
        tok_ids=TID, fb_ids=FB,
    )
    assert got == [FB[b] for b in "éé😀".encode("utf-8")]


def test_kernel_end_to_end_and_count_consistency(spark):
    from pyspark.sql import functions as F

    lm = unigram_from_tokens(spark, LM, UNK)
    docs = spark.createDataFrame(
        [
            (1, "the héllo"),
            (2, "😀 lo✓the"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    ids = unigram_token_ids(
        docs, lm, out_col="ids", token_ids=TID, byte_fallback_ids=FB
    )
    cnt = unigram_token_count(
        ids, lm, out_col="n", byte_fallback_ids=FB
    ).withColumn("sz", F.size("ids").cast("double"))
    rows = {r["doc_id"]: r for r in cnt.collect()}
    assert rows[4]["ids"] is None and rows[4]["n"] is None
    assert rows[3]["ids"] == [] and rows[3]["n"] == 0.0
    for d in (1, 2):
        assert rows[d]["n"] == float(len(rows[d]["ids"])), d
    # é is 2 bytes: 'héllo' = h + fb(é)*2 + l + lo
    assert rows[1]["ids"] == [
        TID["the"], TID["h"],
        FB[0xC3], FB[0xA9],
        TID["l"], TID["lo"],
    ]
    # decode: valid byte runs come back as their characters
    dec = unigram_decode_ids(
        ids, lm, ids_col="ids", out_col="t", token_ids=TID,
        byte_fallback_ids=FB,
    )
    got = {r["doc_id"]: r["t"] for r in dec.collect()}
    assert got[1] == "thehéllo"
    assert got[2] == "😀lo✓the"
    assert got[3] == "" and got[4] is None


def test_decode_invalid_run_replacement_rule(spark):
    """The published ByteFallback decoder: an invalid UTF-8 run emits
    one U+FFFD PER BYTE (never a partial decode)."""
    lm = unigram_from_tokens(spark, LM, UNK)
    df = spark.createDataFrame(
        [
            (1, [FB[0xC3], FB[0xA9]]),          # valid: é
            (2, [FB[0xC3], FB[0x28]]),          # invalid 2-byte run
            (3, [FB[0xF0], FB[0x9F], FB[0x98]]),  # truncated emoji
            (4, [TID["the"], FB[0xFF], TID["lo"]]),
        ],
        "doc_id long, ids array<long>",
    )
    dec = unigram_decode_ids(
        df, lm, ids_col="ids", out_col="t", token_ids=TID,
        byte_fallback_ids=FB,
    )
    got = {r["doc_id"]: r["t"] for r in dec.collect()}
    assert got[1] == "é"
    assert got[2] == "��"
    assert got[3] == "���"
    assert got[4] == "the�lo"


def test_marker_mode_composes_with_fallback(spark):
    """The Llama unigram shape: marker grain + byte fallback — the
    dummy-prefix marker char itself is covered by the artifact, and
    unknown word chars fall back to bytes; decode reproduces the
    single-spaced text."""
    sp_lm = {
        "▁the": -2.0, "▁": -4.5, "t": -4.0, "h": -4.1, "e": -3.9,
    }
    tid = {t: i for i, t in enumerate(sorted(sp_lm))}
    lm = unigram_from_tokens(spark, sp_lm, UNK)
    docs = spark.createDataFrame(
        [(1, "the héllo")], "doc_id long, text string"
    )
    ids = unigram_token_ids(
        docs, lm, out_col="ids", token_ids=tid, space_marker="▁",
        byte_fallback_ids=FB,
    )
    [row] = ids.collect()
    # '▁héllo': the marker single, covered h/e, fallback é (2
    # bytes) and the uncovered ASCII l/l/o (1 byte each)
    assert row["ids"] == [
        tid["▁the"], tid["▁"], tid["h"],
        FB[0xC3], FB[0xA9],
        FB[ord("l")], FB[ord("l")], FB[ord("o")],
    ]
    dec = unigram_decode_ids(
        ids, lm, ids_col="ids", out_col="t", token_ids=tid,
        space_marker="▁", byte_fallback_ids=FB,
    )
    assert dec.collect()[0]["t"] == "the héllo"


def test_oversize_chars_fallback_grain(spark):
    """Past the tie-break bound (byte length under fallback) the
    'chars' grain emits per-char: covered → its id, unknown → its
    bytes' ids."""
    blob = "é" * 600  # 1200 bytes > _TIE_BASE, 600 chars < _TIE_BASE
    got = _viterbi_ids_word(
        blob, tok_micro=MICRO, lens=LENS, unk_micro=UNKM,
        tok_ids=TID, oversize_word="chars", fb_ids=FB,
    )
    assert got == [FB[b] for b in blob.encode("utf-8")]
    cnt = _viterbi_count_word(
        blob, tok_micro=MICRO, lens=LENS, unk_micro=UNKM,
        oversize_word="chars", byte_fallback=True,
    )
    assert cnt == float(len(got))
    with pytest.raises(ValueError, match="tie-break packing bound"):
        _viterbi_ids_word(
            blob, tok_micro=MICRO, lens=LENS, unk_micro=UNKM,
            tok_ids=TID, fb_ids=FB,
        )


def test_fallback_validation_contract(spark):
    lm = unigram_from_tokens(spark, LM, UNK)
    docs = spark.createDataFrame(
        [(1, "the")], "doc_id long, text string"
    )
    partial = {b: 1000 + b for b in range(255)}
    with pytest.raises(ValueError, match="cover bytes 0..255"):
        unigram_token_ids(
            docs, lm, token_ids=TID, byte_fallback_ids=partial
        )
    dup = dict(FB)
    dup[0] = dup[1]
    with pytest.raises(ValueError, match="distinct"):
        unigram_token_count(docs, lm, byte_fallback_ids=dup)
    with pytest.raises(ValueError, match="decode two ways"):
        unigram_token_ids(
            docs, lm, token_ids=TID, byte_fallback_ids=FB,
            special_tokens={"<s>": 1000},
        )
    # a fallback id landing on an unrelated piece's id refuses
    clash = dict(FB)
    clash[7] = TID["the"]
    with pytest.raises(ValueError, match="<0xNN> pieces themselves"):
        unigram_token_ids(
            docs, lm, token_ids=TID, byte_fallback_ids=clash
        )
