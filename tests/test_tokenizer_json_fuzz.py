"""Property fuzz for the tokenizer.json serde
(functions/tokenizer_json.py): EXPORT → IMPORT value identity and
re-export BYTE identity over randomized artifacts — arbitrary
whitespace-free unicode tokens, arbitrary finite scores/ids — so the
round-trip contract holds beyond the hand-picked suites (the
differential-fuzz discipline of tests/test_textops_differential.py
applied to the serde layer).  Example counts are small: every
example pays Spark createDataFrame/collect round trips."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from wikiextractor_spark.functions.tokenizer_json import (
    load_tokenizer_json,
    save_tokenizer_json_bpe,
    save_tokenizer_json_unigram,
    save_tokenizer_json_wordpiece,
)

# whitespace-free unicode token text: no separators (Zs/Zl/Zp), no
# control/surrogate chars (Cc covers \t..\x1f and \x85, all inside
# Python's \s; Cs breaks JSON encoding)
token_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs"),
    ),
    min_size=1, max_size=6,
)

token_sets = st.sets(token_text, min_size=2, max_size=12)

finite_score = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e6, max_value=-1e-6,
)


@settings(max_examples=10, deadline=None)
@given(tokens=token_sets, data=st.data())
def test_bpe_round_trip_fuzz(spark, tmp_path_factory, tokens, data):
    from wikiextractor_spark.functions.tokenizer import (
        vocab_from_tokens,
    )

    toks = sorted(tokens)
    oov = data.draw(
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=0.0, max_value=10.0)
    )
    # merges: distinct pairs drawn from the token texts, rank = order
    n_pairs = data.draw(st.integers(min_value=1, max_value=4))
    pairs = []
    seen = set()
    for _ in range(n_pairs):
        a = data.draw(st.sampled_from(toks))
        b = data.draw(st.sampled_from(toks))
        if (a, b) not in seen:
            seen.add((a, b))
            pairs.append((a, b))
    merges = {p: float(i) for i, p in enumerate(pairs)}
    d = tmp_path_factory.mktemp("tjf")
    p = str(d / "t.json")
    vocab = vocab_from_tokens(spark, toks, oov)
    save_tokenizer_json_bpe(spark, vocab, merges, p)
    m = load_tokenizer_json(spark, p, oov_tokens_per_char=oov)
    got = {
        r["token"]: r["token_id"] for r in m.vocab.collect()
        if r["token"] is not None
    }
    assert got == {t: float(i) for i, t in enumerate(toks)}
    assert m.merges == merges
    got_oov = [
        r["token_id"] for r in m.vocab.collect()
        if r["token"] is None
    ]
    assert got_oov == [oov]
    p2 = str(d / "t2.json")
    save_tokenizer_json_bpe(spark, m.vocab, m.merges, p2)
    with open(p, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()


@settings(max_examples=10, deadline=None)
@given(
    lm=st.dictionaries(
        token_text, finite_score, min_size=1, max_size=12,
    ),
    unk=finite_score,
)
def test_unigram_round_trip_fuzz(spark, tmp_path_factory, lm, unk):
    from wikiextractor_spark.functions.unigram import (
        unigram_from_tokens,
    )

    lm = {t: s for t, s in lm.items() if t != "<unk>"}
    if not lm:
        return
    d = tmp_path_factory.mktemp("tjf")
    p = str(d / "t.json")
    frame = unigram_from_tokens(spark, lm, unk)
    save_tokenizer_json_unigram(spark, frame, p)
    m = load_tokenizer_json(spark, p, unk_logprob=unk)
    got = {
        r["token"]: r["logprob"] for r in m.lm.collect()
        if r["token"] is not None
    }
    assert got == lm
    got_unk = [
        r["logprob"] for r in m.lm.collect() if r["token"] is None
    ]
    assert got_unk == [unk]
    # published numbering: most-probable-first after the unk entry
    ordered = sorted(lm.items(), key=lambda kv: (-kv[1], kv[0]))
    assert m.token_ids == {
        t: i + 1 for i, (t, _s) in enumerate(ordered)
    }
    p2 = str(d / "t2.json")
    save_tokenizer_json_unigram(spark, m.lm, p2)
    with open(p, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()


@settings(max_examples=10, deadline=None)
@given(tokens=token_sets)
def test_wordpiece_round_trip_fuzz(spark, tmp_path_factory, tokens):
    from wikiextractor_spark.functions.wordpiece import (
        wordpiece_from_tokens,
    )

    toks = ["[UNK]"] + sorted(t for t in tokens if t != "[UNK]")
    d = tmp_path_factory.mktemp("tjf")
    p = str(d / "t.json")
    vocab = wordpiece_from_tokens(spark, toks)
    save_tokenizer_json_wordpiece(spark, vocab, p)
    m = load_tokenizer_json(spark, p)
    got = {r["token"]: r["token_id"] for r in m.vocab.collect()}
    assert got == {t: float(i) for i, t in enumerate(toks)}
    assert m.unk_token == "[UNK]"
    p2 = str(d / "t2.json")
    save_tokenizer_json_wordpiece(spark, m.vocab, p2)
    with open(p, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
