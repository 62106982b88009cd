"""HF single-file tokenizer.json import/export
(functions/tokenizer_json.py): per-family round trips (export →
reimport equality + re-export byte identity), serving identity
against the direct kernel calls, the published component-block
mappings (ByteLevel, BertNormalizer/BertPreTokenizer, Metaspace and
the Llama-shape Prepend+Replace pair), the Unigram min-minus-penalty
unk rule, and the raise-don't-guess contracts on unsupported
blocks."""

from __future__ import annotations

import json
import os

import pytest

from wikiextractor_spark.functions.tokenizer import (
    gpt2_bytes_to_unicode,
    merges_from_pairs,
    vocab_from_tokens,
)
from wikiextractor_spark.functions.tokenizer_json import (
    UNK_PENALTY,
    load_tokenizer_json,
    save_tokenizer_json_bpe,
    save_tokenizer_json_unigram,
    save_tokenizer_json_wordpiece,
    tokenizer_json_decode_ids,
    tokenizer_json_encode_pairs,
    tokenizer_json_token_ids,
)

BYTE = gpt2_bytes_to_unicode()
SP = BYTE[ord(" ")]  # 'Ġ'

# a small byte-level vocabulary: the full base alphabet is not needed
# for round-trip/serving-identity pins — a partial one exercises the
# OOV path too
G2_TOKENS = [
    "t", "h", "e", "d", "a", SP, f"{SP}t", f"{SP}th", f"{SP}the",
    "da", "dat", "data",
]
G2_MERGES = [
    (SP, "t"), (f"{SP}t", "h"), (f"{SP}th", "e"), ("d", "a"),
    ("da", "t"), ("dat", "a"),
]
SPECIAL = "<|endoftext|>"
SPECIAL_ID = 50256

WP_TOKENS = [
    "[UNK]", "the", "dat", "##a", "a", "d", "t", "##he", "##t",
    "un", "##aff", "##able",
]

UNI_LM = {
    "the": -2.0, "dat": -2.5, "a": -4.0, "d": -4.4, "t": -4.05,
    "h": -4.45, "e": -3.98,
}
UNI_MARKED = {"▁the": -2.0, "▁dat": -2.5, **{
    "▁" + k: v - 0.01 for k, v in UNI_LM.items() if len(k) == 1
}, **UNI_LM}


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the data"),
            (2, f"the end{SPECIAL}of the data"),
            (3, "that dated theme"),
            (4, "zz unaffable zz"),
            (None, None),
        ],
        "doc_id long, text string",
    ).fillna({"doc_id": 5})


def _read(spark, path):
    with open(path, "rb") as f:
        return f.read()


def _col(df, out, order="doc_id"):
    return [
        r[out] for r in df.orderBy(order).select(order, out).collect()
    ]


# -------------------------------------------------------------------------
# BPE
# -------------------------------------------------------------------------

class TestBpe:
    def test_byte_level_round_trip(self, spark, tmp_path):
        p = str(tmp_path / "tokenizer.json")
        vocab = vocab_from_tokens(spark, G2_TOKENS, 0.5)
        merges = {pr: float(i) for i, pr in enumerate(G2_MERGES)}
        save_tokenizer_json_bpe(
            spark, vocab, merges, p, byte_level=True,
            special_tokens={SPECIAL: SPECIAL_ID},
        )
        m = load_tokenizer_json(spark, p, oov_tokens_per_char=0.5)
        assert m.family == "bpe"
        assert m.byte_level is True
        assert m.special_tokens == {SPECIAL: SPECIAL_ID}
        assert m.merges == merges
        got = {
            r["token"]: r["token_id"]
            for r in m.vocab.collect() if r["token"] is not None
        }
        assert got == {t: float(i) for i, t in enumerate(G2_TOKENS)}
        oov = [
            r["token_id"] for r in m.vocab.collect()
            if r["token"] is None
        ]
        assert oov == [0.5]
        assert m.divergences == ()
        # re-export is byte-identical
        p2 = str(tmp_path / "again.json")
        save_tokenizer_json_bpe(
            spark, m.vocab, m.merges, p2, byte_level=True,
            special_tokens=m.special_tokens,
        )
        assert _read(spark, p) == _read(spark, p2)

    def test_byte_level_serving_identity(self, spark, tmp_path):
        from wikiextractor_spark.functions.tokenizer import (
            GPT2_PRETOKENIZER_PATTERN,
            bpe_decode_ids,
            bpe_token_ids,
        )

        p = str(tmp_path / "tokenizer.json")
        vocab = vocab_from_tokens(spark, G2_TOKENS, 0.5)
        merges = {pr: float(i) for i, pr in enumerate(G2_MERGES)}
        save_tokenizer_json_bpe(
            spark, vocab, merges, p, byte_level=True,
            special_tokens={SPECIAL: SPECIAL_ID},
        )
        m = load_tokenizer_json(spark, p, oov_tokens_per_char=0.5)
        docs = _docs(spark)
        direct = bpe_token_ids(
            docs, vocab, merges, out_col="ids", byte_level=True,
            pre_tokenizer=GPT2_PRETOKENIZER_PATTERN,
            special_tokens={SPECIAL: SPECIAL_ID},
        )
        direct = bpe_decode_ids(
            direct, vocab, ids_col="ids", out_col="dec",
            byte_level=True, special_tokens={SPECIAL: SPECIAL_ID},
        )
        via = tokenizer_json_token_ids(docs, m, out_col="ids")
        via = tokenizer_json_decode_ids(via, m, ids_col="ids",
                                        out_col="dec")
        assert _col(direct, "ids") == _col(via, "ids")
        assert _col(direct, "dec") == _col(via, "dec")

    def test_char_grain_round_trip(self, spark, tmp_path):
        p = str(tmp_path / "tokenizer.json")
        vocab = vocab_from_tokens(
            spark, ["t", "h", "e", "th", "the"], 1.0
        )
        merges = {("t", "h"): 0.0, ("th", "e"): 1.0}
        save_tokenizer_json_bpe(spark, vocab, merges, p)
        raw = json.loads(_read(spark, p))
        assert raw["pre_tokenizer"] == {"type": "WhitespaceSplit"}
        assert raw["decoder"] is None
        m = load_tokenizer_json(spark, p)
        assert m.byte_level is False
        assert m.merges == merges
        assert m.special_tokens is None

    def test_import_published_shapes(self, spark, tmp_path):
        """A hand-written GPT-2-shape file: merges as [l, r] pairs
        (the current serialization), the offsets-only ByteLevel
        post_processor (no template, no divergence — it never
        touches the id stream), the special in BOTH added_tokens
        and model.vocab."""
        p = str(tmp_path / "gpt2.json")
        obj = {
            "version": "1.0",
            "added_tokens": [
                {"id": 5, "content": "<|eot|>", "special": True}
            ],
            "normalizer": None,
            "pre_tokenizer": {
                "type": "ByteLevel", "add_prefix_space": False,
                "trim_offsets": True, "use_regex": True,
            },
            "post_processor": {
                "type": "ByteLevel", "trim_offsets": False,
            },
            "decoder": {"type": "ByteLevel"},
            "model": {
                "type": "BPE",
                "dropout": None,
                "unk_token": None,
                "vocab": {
                    "t": 0, "h": 1, "e": 2, "th": 3, "the": 4,
                    "<|eot|>": 5,
                },
                "merges": [["t", "h"], ["th", "e"]],
            },
        }
        with open(p, "w") as f:
            json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        assert m.byte_level is True
        assert m.special_tokens == {"<|eot|>": 5}
        assert m.merges == {("t", "h"): 0.0, ("th", "e"): 1.0}
        assert m.divergences == ()
        assert (m.template_prefix, m.template_suffix) == ((), ())
        ids = tokenizer_json_token_ids(
            spark.createDataFrame(
                [(1, "the<|eot|>the")], "doc_id long, text string"
            ),
            m, out_col="ids",
        )
        assert _col(ids, "ids") == [[4, 5, 4]]

    @pytest.mark.parametrize(
        "mutate, msg",
        [
            (lambda o: o["model"].update(type="WordLevel"),
             "model.type"),
            (lambda o: o["model"].update(dropout=0.1), "dropout"),
            (lambda o: o["model"].update(ignore_merges=True),
             "ignore_merges"),
            # Whitespace SERVES since r16 (TestBpePreTokenizerBlocks)
            # — an unknown block type is what still refuses
            (lambda o: o.update(
                pre_tokenizer={"type": "Split", "pattern": "x"}
            ), "pre_tokenizer"),
            (lambda o: o["pre_tokenizer"].update(use_regex=False),
             "use_regex"),
            (lambda o: o["pre_tokenizer"].update(
                add_prefix_space=True
            ), "add_prefix_space"),
            (lambda o: o["model"].update(
                merges=["t h", "t h"]
            ), "duplicate merge"),
            (lambda o: o["added_tokens"].append(
                {"id": 9, "content": "the", "special": True}
            ), "contradicts"),
            (lambda o: o["added_tokens"].append(
                {"id": 2, "content": "<x>", "special": True}
            ), "collides"),
            (lambda o: o.update(
                normalizer={"type": "Lowercase"}
            ), "normalizer"),
        ],
    )
    def test_import_contracts(self, spark, tmp_path, mutate, msg):
        obj = {
            "added_tokens": [],
            "pre_tokenizer": {
                "type": "ByteLevel", "add_prefix_space": False,
                "trim_offsets": True, "use_regex": True,
            },
            "model": {
                "type": "BPE", "dropout": None, "unk_token": None,
                "vocab": {"t": 0, "h": 1, "e": 2, "th": 3, "the": 4},
                "merges": ["t h", "th e"],
            },
        }
        mutate(obj)
        p = str(tmp_path / "bad.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        with pytest.raises(ValueError, match=msg):
            load_tokenizer_json(spark, p)

    def test_not_json_and_not_tokenizer(self, spark, tmp_path):
        p = str(tmp_path / "nope.json")
        with open(p, "w") as f:
            f.write("{not json")
        with pytest.raises(ValueError, match="not valid JSON"):
            load_tokenizer_json(spark, p)
        with open(p, "w") as f:
            json.dump({"vocab": {}}, f)
        with pytest.raises(ValueError, match="no model block"):
            load_tokenizer_json(spark, p)


# -------------------------------------------------------------------------
# WordPiece
# -------------------------------------------------------------------------

class TestWordPiece:
    def _vocab(self, spark):
        from wikiextractor_spark.functions.wordpiece import (
            wordpiece_from_tokens,
        )

        return wordpiece_from_tokens(spark, WP_TOKENS)

    def test_round_trip_uncased(self, spark, tmp_path):
        p = str(tmp_path / "tokenizer.json")
        save_tokenizer_json_wordpiece(
            spark, self._vocab(spark), p, basic_tokenize=True,
            max_input_chars_per_word=100,
            special_tokens={"[CLS]": 101, "[SEP]": 102},
        )
        m = load_tokenizer_json(spark, p)
        assert m.family == "wordpiece"
        assert (m.basic_tokenize, m.lower, m.strip_accents) == (
            True, True, True,
        )
        assert m.unk_token == "[UNK]"
        assert m.max_input_chars_per_word == 100
        assert m.special_tokens == {"[CLS]": 101, "[SEP]": 102}
        got = {
            r["token"]: r["token_id"] for r in m.vocab.collect()
        }
        assert got == {t: float(i) for i, t in enumerate(WP_TOKENS)}
        p2 = str(tmp_path / "again.json")
        save_tokenizer_json_wordpiece(
            spark, m.vocab, p2, basic_tokenize=True,
            max_input_chars_per_word=100,
            special_tokens=m.special_tokens,
        )
        assert _read(spark, p) == _read(spark, p2)

    def test_cased_config_maps_to_bert_pretokenizer_only(
        self, spark, tmp_path,
    ):
        p = str(tmp_path / "tokenizer.json")
        save_tokenizer_json_wordpiece(
            spark, self._vocab(spark), p, basic_tokenize=True,
            lower=False, strip_accents=False,
        )
        raw = json.loads(_read(spark, p))
        assert raw["normalizer"]["lowercase"] is False
        m = load_tokenizer_json(spark, p)
        assert (m.basic_tokenize, m.lower, m.strip_accents) == (
            True, False, False,
        )
        # the normalizer-less published cased shape imports too
        raw["normalizer"] = None
        raw["pre_tokenizer"] = {"type": "BertPreTokenizer"}
        p2 = str(tmp_path / "cased.json")
        with open(p2, "w") as f:
            json.dump(raw, f)
        m2 = load_tokenizer_json(spark, p2)
        assert (m2.basic_tokenize, m2.lower, m2.strip_accents) == (
            True, False, False,
        )

    def test_serving_identity_basic_grain(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from wikiextractor_spark.functions.wordpiece import (
            basic_tokenize_text,
            wordpiece_token_ids,
        )

        p = str(tmp_path / "tokenizer.json")
        vocab = self._vocab(spark)
        save_tokenizer_json_wordpiece(
            spark, vocab, p, basic_tokenize=True,
        )
        m = load_tokenizer_json(spark, p)
        docs = spark.createDataFrame(
            [(1, "The DATA, unaffable!"), (2, "Thé dät")],
            "doc_id long, text string",
        )
        direct = wordpiece_token_ids(
            docs.withColumn("text", basic_tokenize_text("text")),
            vocab, out_col="ids", max_input_chars_per_word=100,
        )
        via = tokenizer_json_token_ids(docs, m, out_col="ids")
        assert _col(direct, "ids") == _col(via, "ids")
        # the caller's text column survives the internal basic pass
        assert _col(via, "text") == [
            r["text"] for r in docs.orderBy("doc_id").collect()
        ]
        dec = tokenizer_json_decode_ids(via, m, ids_col="ids",
                                        out_col="dec")
        # ',' and '!' are out of vocabulary → the unk text
        assert _col(dec, "dec") == [
            "the data [UNK] unaffable [UNK]", "the dat",
        ]

    def test_export_contracts(self, spark, tmp_path):
        p = str(tmp_path / "x.json")
        with pytest.raises(ValueError, match="unk_token"):
            save_tokenizer_json_wordpiece(
                spark, self._vocab(spark), p, unk_token="<none>",
            )
        with pytest.raises(ValueError, match="max_input_chars"):
            save_tokenizer_json_wordpiece(
                spark, self._vocab(spark), p,
                max_input_chars_per_word=0,
            )

    def test_import_contracts(self, spark, tmp_path):
        base = {
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 100,
                "vocab": {t: i for i, t in enumerate(WP_TOKENS)},
            },
        }
        for mutate, msg in [
            (lambda o: o["model"].update(
                continuing_subword_prefix="++"
            ), "continuing_subword_prefix"),
            (lambda o: o["model"].update(unk_token=None),
             "unk_token"),
            (lambda o: o["model"].update(unk_token="<gone>"),
             "not in model.vocab"),
            (lambda o: o.update(normalizer={
                "type": "BertNormalizer", "lowercase": True,
            }, pre_tokenizer={"type": "WhitespaceSplit"}),
             "BertNormalizer with pre_tokenizer"),
            (lambda o: o["model"].update(
                max_input_chars_per_word="100"
            ), "max_input_chars"),
        ]:
            obj = json.loads(json.dumps(base))
            mutate(obj)
            p = str(tmp_path / "bad.json")
            with open(p, "w") as f:
                json.dump(obj, f)
            with pytest.raises(ValueError, match=msg):
                load_tokenizer_json(spark, p)


# -------------------------------------------------------------------------
# Unigram
# -------------------------------------------------------------------------

class TestUnigram:
    def _lm(self, spark, toks=None, unk=-10.0):
        from wikiextractor_spark.functions.unigram import (
            unigram_from_tokens,
        )

        return unigram_from_tokens(spark, toks or UNI_LM, unk)

    def test_round_trip_published_unk_rule(self, spark, tmp_path):
        p = str(tmp_path / "tokenizer.json")
        save_tokenizer_json_unigram(spark, self._lm(spark), p)
        m = load_tokenizer_json(spark, p)
        assert m.family == "unigram"
        toks = {
            r["token"]: r["logprob"] for r in m.lm.collect()
            if r["token"] is not None
        }
        assert toks == UNI_LM
        # the published numbering: unk at 0, pieces
        # most-probable-first at 1..n
        ordered = sorted(UNI_LM.items(), key=lambda kv: (-kv[1], kv[0]))
        assert m.token_ids == {
            t: i + 1 for i, (t, _s) in enumerate(ordered)
        }
        # unk = min score - kUnkPenalty, NEVER the stored 0.0
        unk = [
            r["logprob"] for r in m.lm.collect()
            if r["token"] is None
        ]
        assert unk == [min(UNI_LM.values()) - UNK_PENALTY]
        # explicit override (the load_unigram_lm convention)
        m2 = load_tokenizer_json(spark, p, unk_logprob=-10.0)
        unk2 = [
            r["logprob"] for r in m2.lm.collect()
            if r["token"] is None
        ]
        assert unk2 == [-10.0]
        # re-export byte identity
        p2 = str(tmp_path / "again.json")
        save_tokenizer_json_unigram(spark, m2.lm, p2)
        assert _read(spark, p) == _read(spark, p2)

    def test_marker_round_trip_and_serving(self, spark, tmp_path):
        from wikiextractor_spark.functions.unigram import (
            unigram_token_ids,
        )

        p = str(tmp_path / "tokenizer.json")
        save_tokenizer_json_unigram(
            spark, self._lm(spark, UNI_MARKED), p, space_marker="▁",
        )
        raw = json.loads(_read(spark, p))
        assert raw["pre_tokenizer"]["type"] == "Metaspace"
        m = load_tokenizer_json(spark, p)
        assert m.space_marker == "▁"
        docs = spark.createDataFrame(
            [(1, "the dat"), (2, "data the")],
            "doc_id long, text string",
        )
        direct = unigram_token_ids(
            docs, m.lm, out_col="ids", token_ids=m.token_ids,
            oversize_word="chars", space_marker="▁",
        )
        via = tokenizer_json_token_ids(docs, m, out_col="ids")
        assert _col(direct, "ids") == _col(via, "ids")
        dec = tokenizer_json_decode_ids(via, m, ids_col="ids",
                                        out_col="dec")
        assert _col(dec, "dec") == ["the dat", "data the"]

    def test_llama_shape_normalizer(self, spark, tmp_path):
        """The Llama serialization: no pre_tokenizer, the marker via
        Sequence[Prepend, Replace] with the tagged-pattern form, a
        Precompiled charsmap recorded as a stated divergence."""
        obj = {
            "normalizer": {
                "type": "Sequence",
                "normalizers": [
                    {"type": "Precompiled",
                     "precompiled_charsmap": "abc"},
                    {"type": "Prepend", "prepend": "▁"},
                    {"type": "Replace",
                     "pattern": {"String": " "}, "content": "▁"},
                ],
            },
            "pre_tokenizer": None,
            "model": {
                "type": "Unigram",
                "unk_id": 0,
                "vocab": [
                    ["<unk>", 0.0], ["▁the", -2.0], ["▁dat", -2.5],
                    ["▁a", -4.0], ["a", -4.2], ["t", -4.3],
                ],
                "byte_fallback": False,
            },
        }
        p = str(tmp_path / "llama.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        assert m.space_marker == "▁"
        assert "normalizer:Precompiled" in m.divergences
        assert m.token_ids == {
            "▁the": 1, "▁dat": 2, "▁a": 3, "a": 4, "t": 5,
        }

    def test_control_pieces_become_overlay(self, spark, tmp_path):
        """<s>/</s> in added_tokens AND model.vocab: dropped from
        the matchable table (a score-0 piece must never win a
        segmentation), served through the special pre-split."""
        obj = {
            "added_tokens": [
                {"id": 1, "content": "<s>", "special": True},
                {"id": 2, "content": "</s>", "special": True},
            ],
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "model": {
                "type": "Unigram",
                "unk_id": 0,
                "vocab": [
                    ["<unk>", 0.0], ["<s>", 0.0], ["</s>", 0.0],
                    ["the", -2.0], ["t", -4.0], ["h", -4.1],
                    ["e", -4.2],
                ],
            },
        }
        p = str(tmp_path / "sp.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        toks = {
            r["token"] for r in m.lm.collect()
            if r["token"] is not None
        }
        assert toks == {"the", "t", "h", "e"}
        assert m.token_ids == {"the": 3, "t": 4, "h": 5, "e": 6}
        ids = tokenizer_json_token_ids(
            spark.createDataFrame(
                [(1, "<s>the the</s>")], "doc_id long, text string"
            ),
            m, out_col="ids",
        )
        assert _col(ids, "ids") == [[1, 3, 3, 2]]

    def test_import_contracts(self, spark, tmp_path):
        base = {
            "model": {
                "type": "Unigram", "unk_id": 0,
                "vocab": [["<unk>", 0.0], ["the", -2.0],
                          ["t", -4.0]],
            },
        }
        for mutate, msg in [
            (lambda o: o["model"].update(byte_fallback=True),
             "byte_fallback"),
            (lambda o: o["model"].update(unk_id=99),
             "out of range"),
            (lambda o: o["model"].update(unk_id=None),
             "unk_logprob"),
            (lambda o: o["model"]["vocab"].append(["a b", -3.0]),
             "whitespace"),
            (lambda o: o["model"]["vocab"].append(["the", -3.0]),
             "duplicate"),
            (lambda o: o.update(pre_tokenizer={
                "type": "Metaspace", "replacement": "▁",
            }), "ZERO"),  # plain-grain artifact under marker mode
        ]:
            obj = json.loads(json.dumps(base))
            mutate(obj)
            p = str(tmp_path / "bad.json")
            with open(p, "w") as f:
                json.dump(obj, f)
            with pytest.raises(ValueError, match=msg):
                load_tokenizer_json(spark, p)

    def test_export_contracts(self, spark, tmp_path):
        p = str(tmp_path / "x.json")
        with pytest.raises(ValueError, match="also a piece"):
            save_tokenizer_json_unigram(
                spark, self._lm(spark), p, unk_token="the",
            )
        with pytest.raises(ValueError, match="collides"):
            save_tokenizer_json_unigram(
                spark, self._lm(spark), p,
                special_tokens={"<s>": 1},
            )
        with pytest.raises(ValueError, match="marker"):
            save_tokenizer_json_unigram(
                spark, self._lm(spark), p, space_marker="▁",
            )


# -------------------------------------------------------------------------
# post_processor templates (r15)
# -------------------------------------------------------------------------

class TestTemplates:
    def _bert_file(self, tmp_path, pp):
        obj = {
            "added_tokens": [
                {"id": 0, "content": "[CLS]", "special": True},
                {"id": 1, "content": "[SEP]", "special": True},
            ],
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "post_processor": pp,
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 100,
                "vocab": {
                    "[CLS]": 0, "[SEP]": 1, "[UNK]": 2, "the": 3,
                    "dat": 4, "##a": 5,
                },
            },
        }
        p = str(tmp_path / "bert.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        return p

    TEMPLATE_PP = {
        "type": "TemplateProcessing",
        "single": [
            {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
            {"Sequence": {"id": "A", "type_id": 0}},
            {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
        ],
        "pair": [
            {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
            {"Sequence": {"id": "A", "type_id": 0}},
            {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
            {"Sequence": {"id": "B", "type_id": 1}},
            {"SpecialToken": {"id": "[SEP]", "type_id": 1}},
        ],
        "special_tokens": {
            "[CLS]": {"id": "[CLS]", "ids": [0], "tokens": ["[CLS]"]},
            "[SEP]": {"id": "[SEP]", "ids": [1], "tokens": ["[SEP]"]},
        },
    }

    def test_template_processing_single(self, spark, tmp_path):
        p = self._bert_file(tmp_path, self.TEMPLATE_PP)
        m = load_tokenizer_json(spark, p)
        assert m.template_prefix == (0,)
        assert m.template_suffix == (1,)
        # the BERT-shape pair template now PARSES (r15 pair encode)
        # instead of recording the divergence
        assert m.pair_elements != ()
        assert m.divergences == ()
        docs = spark.createDataFrame(
            [(1, "the data"), (2, None)], "doc_id long, text string",
        )
        ids = tokenizer_json_token_ids(docs, m, out_col="ids")
        assert _col(ids, "ids") == [[0, 3, 4, 5, 1], None]
        # the published add_special_tokens=False escape hatch
        body = tokenizer_json_token_ids(
            docs, m, out_col="ids", add_special_tokens=False,
        )
        assert _col(body, "ids") == [[3, 4, 5], None]
        # decode renders the template specials verbatim
        dec = tokenizer_json_decode_ids(ids, m, ids_col="ids",
                                        out_col="dec")
        assert _col(dec, "dec") == ["[CLS] the data [SEP]", None]

    def test_bert_and_roberta_processing(self, spark, tmp_path):
        for t in ("BertProcessing", "RobertaProcessing"):
            p = self._bert_file(tmp_path, {
                "type": t, "sep": ["[SEP]", 1], "cls": ["[CLS]", 0],
            })
            m = load_tokenizer_json(spark, p)
            assert m.template_prefix == (0,)
            assert m.template_suffix == (1,)
            assert m.divergences == ()

    def test_unknown_post_processor_still_divergence(
        self, spark, tmp_path,
    ):
        p = self._bert_file(tmp_path, {"type": "Exotic"})
        m = load_tokenizer_json(spark, p)
        assert "post_processor" in m.divergences
        assert (m.template_prefix, m.template_suffix) == ((), ())

    def test_template_contracts(self, spark, tmp_path):
        for mutate, msg in [
            (lambda pp: pp["single"].__setitem__(
                1, {"Sequence": {"id": "B", "type_id": 0}}
            ), "sequence A"),
            (lambda pp: pp["special_tokens"]["[CLS]"].update(
                ids=[0, 1]
            ), "exactly one id"),
            (lambda pp: pp.update(single=[
                {"SpecialToken": {"id": "[CLS]", "type_id": 0}}
            ]), "never references"),
            (lambda pp: pp["single"].__setitem__(
                0, {"SpecialToken": {"id": "<missing>",
                                     "type_id": 0}}
            ), "exactly one id"),
        ]:
            pp = json.loads(json.dumps(self.TEMPLATE_PP))
            mutate(pp)
            p = self._bert_file(tmp_path, pp)
            with pytest.raises(ValueError, match=msg):
                load_tokenizer_json(spark, p)

    def test_export_template_round_trip(self, spark, tmp_path):
        from wikiextractor_spark.functions.wordpiece import (
            wordpiece_from_tokens,
        )

        vocab = wordpiece_from_tokens(
            spark, ["[CLS]", "[SEP]", "[UNK]", "the", "dat", "##a"]
        )
        p = str(tmp_path / "tokenizer.json")
        save_tokenizer_json_wordpiece(
            spark, vocab, p,
            special_tokens={"[CLS]": 0, "[SEP]": 1},
            template=(["[CLS]"], ["[SEP]"]),
        )
        m = load_tokenizer_json(spark, p)
        assert m.template_prefix == (0,)
        assert m.template_suffix == (1,)
        # re-export byte identity through the parsed model
        p2 = str(tmp_path / "again.json")
        save_tokenizer_json_wordpiece(
            spark, m.vocab, p2,
            special_tokens=m.special_tokens,
            template=(["[CLS]"], ["[SEP]"]),
        )
        assert _read(spark, p) == _read(spark, p2)
        # a template text that is not a declared special refuses
        with pytest.raises(ValueError, match="declared special"):
            save_tokenizer_json_wordpiece(
                spark, vocab, p, template=(["[CLS]"], []),
            )


# -------------------------------------------------------------------------
# r15 review fixes: added-token order under the basic grain, Metaspace
# fields, Sequence post_processor, null-pre_tokenizer divergences,
# exporter text collisions
# -------------------------------------------------------------------------

class TestReviewFixes:
    def test_basic_twin_equals_native(self, spark):
        from wikiextractor_spark.functions.wordpiece import (
            basic_tokenize_one,
            basic_tokenize_text,
        )

        adversaria = [
            "The DATA, unaffable!", "Thé dät", "a-b_c…d",
            "«quoted» [brackets] {braces}", "ÀÉÎÕÜ çñ",
            "tabs\tand\nnewlines\r\nhere", "no_punct words only",
            "İstanbul STRASSE ß", "double  spaces   run",
        ]
        for lower, strip in ((True, True), (False, False),
                             (True, False), (False, True)):
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(adversaria)],
                "doc_id long, text string",
            )
            native = [
                r["n"] for r in df.select(
                    "doc_id",
                    basic_tokenize_text(
                        "text", lower=lower, do_strip_accents=strip,
                    ).alias("n"),
                ).orderBy("doc_id").collect()
            ]
            twin = [
                basic_tokenize_one(t, lower=lower,
                                   do_strip_accents=strip)
                for t in adversaria
            ]
            assert native == twin, (lower, strip)

    def test_bert_uncased_specials_survive_basic_grain(
        self, spark, tmp_path,
    ):
        """The canonical bert-base-uncased shape: BertNormalizer +
        added [MASK] — the literal must emit its reserved id while
        the surrounding text normalizes (added tokens split from the
        RAW text, the published order)."""
        obj = {
            "added_tokens": [
                {"id": 3, "content": "[MASK]", "special": True},
            ],
            "normalizer": {
                "type": "BertNormalizer", "lowercase": True,
                "strip_accents": None, "clean_text": False,
                "handle_chinese_chars": False,
            },
            "pre_tokenizer": {"type": "BertPreTokenizer"},
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 100,
                "vocab": {
                    "[UNK]": 0, "the": 1, "dat": 2, "[MASK]": 3,
                    "##a": 4, "!": 5,
                },
            },
        }
        p = str(tmp_path / "uncased.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        docs = spark.createDataFrame(
            [(1, "Thé [MASK] dätä!"), (2, None)],
            "doc_id long, text string",
        )
        ids = tokenizer_json_token_ids(docs, m, out_col="ids")
        # thé→the, [MASK] verbatim at its reserved id, dätä→dat ##a,
        # '!' split to its own token by the basic grain
        assert _col(ids, "ids") == [[1, 3, 2, 4, 5], None]
        # and without specials in the file the native-chain path
        # still serves (grain equality pinned by the twin test)

    def test_metaspace_field_contracts(self, spark, tmp_path):
        base = {
            "pre_tokenizer": {
                "type": "Metaspace", "replacement": "▁",
                "prepend_scheme": "always", "split": True,
            },
            "model": {
                "type": "Unigram", "unk_id": 0,
                "vocab": [["<unk>", 0.0], ["▁the", -2.0],
                          ["t", -4.0]],
            },
        }
        for scheme in ("never", "first"):
            obj = json.loads(json.dumps(base))
            obj["pre_tokenizer"]["prepend_scheme"] = scheme
            p = str(tmp_path / "ms.json")
            with open(p, "w") as f:
                json.dump(obj, f)
            with pytest.raises(ValueError, match="prepend_scheme"):
                load_tokenizer_json(spark, p)
        # the legacy add_prefix_space=false serialization means the
        # same thing as 'never'
        obj = json.loads(json.dumps(base))
        del obj["pre_tokenizer"]["prepend_scheme"]
        obj["pre_tokenizer"]["add_prefix_space"] = False
        p = str(tmp_path / "ms2.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        with pytest.raises(ValueError, match="prepend_scheme"):
            load_tokenizer_json(spark, p)
        # split=false is the kernels' stated marker-mode divergence
        obj = json.loads(json.dumps(base))
        obj["pre_tokenizer"]["split"] = False
        p = str(tmp_path / "ms3.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        assert "pre_tokenizer:Metaspace.split=false" in m.divergences
        assert m.space_marker == "▁"

    def test_sequence_post_processor_parses_template(
        self, spark, tmp_path,
    ):
        """The modern serialization wraps ByteLevel +
        TemplateProcessing in a Sequence — the template must not be
        lost (the older RobertaProcessing form of the same model
        serves it)."""
        obj = {
            "added_tokens": [
                {"id": 0, "content": "<s>", "special": True},
                {"id": 2, "content": "</s>", "special": True},
            ],
            "pre_tokenizer": {
                "type": "ByteLevel", "add_prefix_space": False,
                "trim_offsets": True, "use_regex": True,
            },
            "post_processor": {
                "type": "Sequence",
                "processors": [
                    {"type": "ByteLevel", "trim_offsets": True},
                    {
                        "type": "TemplateProcessing",
                        "single": [
                            {"SpecialToken": {"id": "<s>",
                                              "type_id": 0}},
                            {"Sequence": {"id": "A", "type_id": 0}},
                            {"SpecialToken": {"id": "</s>",
                                              "type_id": 0}},
                        ],
                        "special_tokens": {
                            "<s>": {"id": "<s>", "ids": [0],
                                    "tokens": ["<s>"]},
                            "</s>": {"id": "</s>", "ids": [2],
                                     "tokens": ["</s>"]},
                        },
                    },
                ],
            },
            "model": {
                "type": "BPE", "dropout": None, "unk_token": None,
                "vocab": {"<s>": 0, "t": 1, "</s>": 2, "h": 3,
                          "e": 4, "th": 5, "the": 6},
                "merges": ["t h", "th e"],
            },
        }
        p = str(tmp_path / "roberta.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        assert m.template_prefix == (0,)
        assert m.template_suffix == (2,)
        assert m.divergences == ()

    def test_null_pretokenizer_recorded(self, spark, tmp_path):
        obj = {
            "model": {
                "type": "BPE", "dropout": None, "unk_token": None,
                "vocab": {"t": 0, "h": 1, "th": 2},
                "merges": ["t h"],
            },
        }
        p = str(tmp_path / "nopre.json")
        with open(p, "w") as f:
            json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        assert any(
            d.startswith("pre_tokenizer:null") for d in m.divergences
        )

    def test_unigram_export_text_collisions(self, spark, tmp_path):
        from wikiextractor_spark.functions.unigram import (
            unigram_from_tokens,
        )

        lm = unigram_from_tokens(
            spark, {"the": -2.0, "t": -4.0}, -10.0
        )
        p = str(tmp_path / "x.json")
        # a special text equal to the unk entry would write a file
        # the importer rejects as self-contradictory
        with pytest.raises(ValueError, match="unk entry"):
            save_tokenizer_json_unigram(
                spark, lm, p, special_tokens={"<unk>": 99},
            )
        with pytest.raises(ValueError, match="also a piece"):
            save_tokenizer_json_unigram(
                spark, lm, p, special_tokens={"the": 99},
            )


# -------------------------------------------------------------------------
# pair encoding + fixed-length padding (r15)
# -------------------------------------------------------------------------

class TestPairEncoding:
    def _file(self, tmp_path, pair=None, pp_type="TemplateProcessing"):
        pp = {
            "type": "TemplateProcessing",
            "single": [
                {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
            ],
            "pair": pair,
            "special_tokens": {
                "[CLS]": {"id": "[CLS]", "ids": [0],
                          "tokens": ["[CLS]"]},
                "[SEP]": {"id": "[SEP]", "ids": [1],
                          "tokens": ["[SEP]"]},
            },
        }
        if pp_type != "TemplateProcessing":
            pp = {"type": pp_type, "cls": ["[CLS]", 0],
                  "sep": ["[SEP]", 1]}
        obj = {
            "added_tokens": [
                {"id": 0, "content": "[CLS]", "special": True},
                {"id": 1, "content": "[SEP]", "special": True},
            ],
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "post_processor": pp,
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 100,
                "vocab": {
                    "[CLS]": 0, "[SEP]": 1, "[UNK]": 2, "the": 3,
                    "dat": 4, "##a": 5, "zz": 6,
                },
            },
        }
        import json as _json
        p = str(tmp_path / "pair.json")
        with open(p, "w") as f:
            _json.dump(obj, f)
        return p

    BERT_PAIR = [
        {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
        {"Sequence": {"id": "A", "type_id": 0}},
        {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
        {"Sequence": {"id": "B", "type_id": 1}},
        {"SpecialToken": {"id": "[SEP]", "type_id": 1}},
    ]

    def test_template_pair_encode(self, spark, tmp_path):
        m = load_tokenizer_json(
            spark, self._file(tmp_path, pair=self.BERT_PAIR)
        )
        assert m.pair_elements == (
            ("special", 0, 0), ("A", None, 0), ("special", 1, 0),
            ("B", None, 1), ("special", 1, 1),
        )
        assert m.divergences == ()
        docs = spark.createDataFrame(
            [(1, "the data", "zz"), (2, "the", None)],
            "doc_id long, text_a string, text_b string",
        )
        enc = tokenizer_json_encode_pairs(docs, m)
        rows = {
            r["doc_id"]: (r["input_ids"], r["token_type_ids"])
            for r in enc.collect()
        }
        assert list(rows[1][0]) == [0, 3, 4, 5, 1, 6, 1]
        assert list(rows[1][1]) == [0, 0, 0, 0, 0, 1, 1]
        # either-NULL → both outputs NULL
        assert rows[2] == (None, None)
        # the original text columns survive
        assert set(enc.columns) >= {"text_a", "text_b"}

    def test_bert_processing_pair_layout(self, spark, tmp_path):
        m = load_tokenizer_json(
            spark, self._file(tmp_path, pp_type="BertProcessing")
        )
        assert m.pair_elements == (
            ("special", 0, 0), ("A", None, 0), ("special", 1, 0),
            ("B", None, 1), ("special", 1, 1),
        )
        m2 = load_tokenizer_json(
            spark, self._file(tmp_path, pp_type="RobertaProcessing")
        )
        # RoBERTa: <s> A </s> </s> B </s>, all type 0
        assert m2.pair_elements == (
            ("special", 0, 0), ("A", None, 0), ("special", 1, 0),
            ("special", 1, 0), ("B", None, 0), ("special", 1, 0),
        )

    def test_unparseable_pair_stays_divergence(self, spark, tmp_path):
        # a pair template referencing A twice is not servable
        bad = [
            {"Sequence": {"id": "A", "type_id": 0}},
            {"Sequence": {"id": "A", "type_id": 1}},
        ]
        m = load_tokenizer_json(
            spark, self._file(tmp_path, pair=bad)
        )
        assert m.pair_elements == ()
        assert "post_processor:pair" in m.divergences
        with pytest.raises(ValueError, match="no servable pair"):
            tokenizer_json_encode_pairs(
                spark.createDataFrame(
                    [(1, "a", "b")],
                    "doc_id long, text_a string, text_b string",
                ),
                m,
            )

    def test_truncation_padding_blocks_recorded(self, spark, tmp_path):
        import json as _json

        obj = _json.loads(
            open(self._file(tmp_path, pair=self.BERT_PAIR)).read()
        )
        obj["truncation"] = {"max_length": 8,
                             "strategy": "LongestFirst"}
        obj["padding"] = {"strategy": {"Fixed": 8}, "pad_id": 0}
        p = str(tmp_path / "tp.json")
        with open(p, "w") as f:
            _json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        # truncation SERVES since r16 (TestTruncation) — the model
        # carries the block; padding stays the recorded divergence
        assert m.truncation == ("LongestFirst", 8)
        assert "truncation" not in m.divergences
        assert "padding" in m.divergences

    def test_pad_token_ids(self, spark):
        from wikiextractor_spark.functions.tokenizer_json import (
            pad_token_ids,
        )

        df = spark.createDataFrame(
            [(1, [5, 6, 7]), (2, [1, 2, 3, 4, 5, 6]), (3, None)],
            "doc_id long, token_ids array<long>",
        )
        out = pad_token_ids(df, max_len=4, pad_id=9)
        rows = {
            r["doc_id"]: (r["token_ids"], r["attention_mask"])
            for r in out.collect()
        }
        assert list(rows[1][0]) == [5, 6, 7, 9]
        assert list(rows[1][1]) == [1, 1, 1, 0]
        assert list(rows[2][0]) == [1, 2, 3, 4]  # right-truncated
        assert list(rows[2][1]) == [1, 1, 1, 1]
        assert rows[3] == (None, None)
        # out_col keeps the source intact when named
        out2 = pad_token_ids(
            df, max_len=4, pad_id=9, out_col="padded"
        )
        r1 = out2.where("doc_id = 1").collect()[0]
        assert list(r1["token_ids"]) == [5, 6, 7]
        assert list(r1["padded"]) == [5, 6, 7, 9]
        with pytest.raises(ValueError, match="max_len"):
            pad_token_ids(df, max_len=0, pad_id=9)
        with pytest.raises(ValueError, match="pad_id"):
            pad_token_ids(df, max_len=4, pad_id=-1)


class TestSecondReviewFixes:
    def test_type_id_validation(self, spark, tmp_path):
        import json as _json

        base = TestPairEncoding.BERT_PAIR
        for bad, msg in ((1.7, "type_id"), ("x", "type_id")):
            pair = _json.loads(_json.dumps(base))
            pair[3]["Sequence"]["type_id"] = bad
            p = TestPairEncoding()._file(tmp_path, pair=pair)
            with pytest.raises(ValueError, match=msg):
                load_tokenizer_json(spark, p)

    def test_null_pretok_divergence_names_served_grain(
        self, spark, tmp_path,
    ):
        import json as _json

        obj = {
            "normalizer": {"type": "BertNormalizer",
                           "lowercase": True},
            "pre_tokenizer": None,
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 100,
                "vocab": {"[UNK]": 0, "the": 1},
            },
        }
        p = str(tmp_path / "n.json")
        with open(p, "w") as f:
            _json.dump(obj, f)
        m = load_tokenizer_json(spark, p)
        assert m.basic_tokenize is True
        assert "pre_tokenizer:null(basic-grain served)" in \
            m.divergences

    def test_pair_template_reexport_round_trip(self, spark, tmp_path):
        from wikiextractor_spark.functions.wordpiece import (
            wordpiece_from_tokens,
        )

        vocab = wordpiece_from_tokens(
            spark, ["[CLS]", "[SEP]", "[UNK]", "the", "dat", "##a"]
        )
        p = str(tmp_path / "t.json")
        save_tokenizer_json_wordpiece(
            spark, vocab, p,
            special_tokens={"[CLS]": 0, "[SEP]": 1},
            template=(["[CLS]"], ["[SEP]"]),
            pair_template=(
                ("special", 0, 0), ("A", None, 0),
                ("special", 1, 0), ("B", None, 1),
                ("special", 1, 1),
            ),
        )
        m = load_tokenizer_json(spark, p)
        assert m.pair_elements == (
            ("special", 0, 0), ("A", None, 0), ("special", 1, 0),
            ("B", None, 1), ("special", 1, 1),
        )
        # a loaded pair template re-exports (no silent loss) and the
        # re-export is byte-identical
        p2 = str(tmp_path / "t2.json")
        save_tokenizer_json_wordpiece(
            spark, m.vocab, p2,
            special_tokens=m.special_tokens,
            template=(["[CLS]"], ["[SEP]"]),
            pair_template=m.pair_elements,
        )
        assert _read(spark, p) == _read(spark, p2)
        # pair-only export uses the bare single template
        p3 = str(tmp_path / "t3.json")
        save_tokenizer_json_wordpiece(
            spark, vocab, p3,
            special_tokens={"[CLS]": 0, "[SEP]": 1},
            pair_template=m.pair_elements,
        )
        m3 = load_tokenizer_json(spark, p3)
        assert m3.pair_elements == m.pair_elements
        assert (m3.template_prefix, m3.template_suffix) == ((), ())
        # an undeclared special id refuses
        with pytest.raises(ValueError, match="not a declared"):
            save_tokenizer_json_wordpiece(
                spark, vocab, p3,
                special_tokens={"[CLS]": 0},
                pair_template=(("special", 7, 0), ("A", None, 0),
                               ("B", None, 1)),
            )

    def test_encode_pairs_preserves_colliding_columns(
        self, spark, tmp_path,
    ):
        m = load_tokenizer_json(
            spark,
            TestPairEncoding()._file(
                tmp_path, pair=TestPairEncoding.BERT_PAIR
            ),
        )
        docs = spark.createDataFrame(
            [(1, "the", "dat", "keep me")],
            "doc_id long, text_a string, text_b string, "
            "_tjn_a string",
        )
        enc = tokenizer_json_encode_pairs(docs, m)
        row = enc.collect()[0]
        assert row["_tjn_a"] == "keep me"
        assert list(row["input_ids"]) == [0, 3, 1, 4, 1]


class TestThirdReviewFixes:
    def test_type_id_nonfinite_and_huge(self, spark, tmp_path):
        import json as _json

        raws = ['{"x": Infinity}', '{"x": NaN}', '{"x": 1e999}',
                '{"x": %d}' % 10**400]
        for raw in raws:
            bad = _json.loads(raw)["x"]
            pair = _json.loads(_json.dumps(TestPairEncoding.BERT_PAIR))
            if bad != bad or bad == float("inf"):
                pair[1]["Sequence"]["type_id"] = bad
            else:
                pair[1]["Sequence"]["type_id"] = bad
            p = TestPairEncoding()._file(tmp_path, pair=pair)
            if isinstance(bad, int):
                # a huge INT literal is integral — accepted, not an
                # OverflowError crash
                m = load_tokenizer_json(spark, p)
                assert m.pair_elements[1][2] == bad
            else:
                with pytest.raises(ValueError, match="type_id"):
                    load_tokenizer_json(spark, p)

    def test_out_col_collisions_with_internals(self, spark, tmp_path):
        m = load_tokenizer_json(
            spark,
            TestPairEncoding()._file(
                tmp_path, pair=TestPairEncoding.BERT_PAIR
            ),
        )
        docs = spark.createDataFrame(
            [(1, "the", "dat")],
            "doc_id long, text_a string, text_b string",
        )
        enc = tokenizer_json_encode_pairs(
            docs, m, out_col="_tjn_a", type_col="_tjn_b",
        )
        row = enc.collect()[0]
        assert list(row["_tjn_a"]) == [0, 3, 1, 4, 1]
        assert list(row["_tjn_b"]) == [0, 0, 0, 1, 1]
        # the basic-grain internal column dodges out_col too
        obj = {
            "normalizer": {"type": "BertNormalizer",
                           "lowercase": True},
            "pre_tokenizer": {"type": "BertPreTokenizer"},
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 100,
                "vocab": {"[UNK]": 0, "the": 1},
            },
        }
        import json as _json
        p = str(tmp_path / "b.json")
        with open(p, "w") as f:
            _json.dump(obj, f)
        mb = load_tokenizer_json(spark, p)
        out = tokenizer_json_token_ids(
            spark.createDataFrame(
                [(1, "The the")], "doc_id long, text string"
            ),
            mb, out_col="_tjn_basic",
        )
        assert list(out.collect()[0]["_tjn_basic"]) == [1, 1]

    def test_pair_template_sequence_id_refuses(self, spark, tmp_path):
        from wikiextractor_spark.functions.wordpiece import (
            wordpiece_from_tokens,
        )

        vocab = wordpiece_from_tokens(
            spark, ["[CLS]", "[SEP]", "[UNK]", "the"]
        )
        with pytest.raises(ValueError, match="take no id"):
            save_tokenizer_json_wordpiece(
                spark, vocab, str(tmp_path / "x.json"),
                special_tokens={"[CLS]": 0, "[SEP]": 1},
                pair_template=(("A", 5, 0), ("special", 1, 0),
                               ("B", None, 1)),
            )

    def test_template_accepts_loaded_id_tuples(self, spark, tmp_path):
        from wikiextractor_spark.functions.wordpiece import (
            wordpiece_from_tokens,
        )

        vocab = wordpiece_from_tokens(
            spark, ["[CLS]", "[SEP]", "[UNK]", "the", "dat", "##a"]
        )
        p = str(tmp_path / "t.json")
        save_tokenizer_json_wordpiece(
            spark, vocab, p,
            special_tokens={"[CLS]": 0, "[SEP]": 1},
            template=(["[CLS]"], ["[SEP]"]),
        )
        m = load_tokenizer_json(spark, p)
        # the loaded id tuples round-trip directly — no hand
        # inversion of the specials mapping
        p2 = str(tmp_path / "t2.json")
        save_tokenizer_json_wordpiece(
            spark, m.vocab, p2,
            special_tokens=m.special_tokens,
            template=(m.template_prefix, m.template_suffix),
        )
        assert _read(spark, p) == _read(spark, p2)
        with pytest.raises(ValueError, match="not a declared"):
            save_tokenizer_json_wordpiece(
                spark, vocab, p2,
                special_tokens={"[CLS]": 0},
                template=((0,), (9,)),
            )


# -------------------------------------------------------------------------
# r16: ADVICE fixes — added-token matching flags, load-time finite
# checks, decoder-block inspection, the library-scope unk minimum
# -------------------------------------------------------------------------

def _write(tmp_path, name, obj):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        json.dump(obj, f)
    return p


def _uni_obj(**over):
    obj = {
        "pre_tokenizer": {"type": "WhitespaceSplit"},
        "model": {
            "type": "Unigram",
            "unk_id": 0,
            "vocab": [["<unk>", 0.0]]
            + [[t, s] for t, s in sorted(UNI_LM.items())],
        },
    }
    obj.update(over)
    return obj


class TestR16Advice:
    def test_added_token_matching_flags_recorded(self, spark, tmp_path):
        """The RoBERTa '<mask>' shape: lstrip=true (and friends) are
        NOT reproduced by the literal pre-split — each flag kind is a
        recorded divergence naming its first offender (r15 ADVICE,
        medium)."""
        obj = _uni_obj(added_tokens=[
            {"id": 1000, "content": "<mask>", "lstrip": True,
             "special": True},
            {"id": 1001, "content": "<only>", "single_word": True,
             "rstrip": True, "normalized": True},
        ])
        m = load_tokenizer_json(spark, _write(tmp_path, "a.json", obj))
        assert "added_tokens:lstrip('<mask>')" in m.divergences
        assert "added_tokens:rstrip('<only>')" in m.divergences
        assert "added_tokens:single_word('<only>')" in m.divergences
        assert "added_tokens:normalized('<only>')" in m.divergences
        # flags absent or false: no divergence
        obj2 = _uni_obj(added_tokens=[
            {"id": 1000, "content": "<s>", "lstrip": False,
             "special": True},
        ])
        m2 = load_tokenizer_json(spark, _write(tmp_path, "b.json", obj2))
        assert not any(
            d.startswith("added_tokens:") for d in m2.divergences
        )

    def test_nonfinite_unigram_score_raises(self, spark, tmp_path):
        """json.loads parses Infinity/NaN literals — a corrupt file
        must fail at LOAD with the entry in hand (r15 ADVICE)."""
        obj = _uni_obj()
        obj["model"]["vocab"].append(["inf", float("inf")])
        with pytest.raises(ValueError, match="finite numeric score"):
            load_tokenizer_json(spark, _write(tmp_path, "i.json", obj))
        obj["model"]["vocab"][-1] = ["nan", float("nan")]
        with pytest.raises(ValueError, match="finite numeric score"):
            load_tokenizer_json(spark, _write(tmp_path, "n.json", obj))

    def test_nonfinite_unk_override_raises(self, spark, tmp_path):
        p = _write(tmp_path, "u.json", _uni_obj())
        with pytest.raises(ValueError, match="unk_logprob override"):
            load_tokenizer_json(spark, p, unk_logprob=float("nan"))
        with pytest.raises(ValueError, match="unk_logprob override"):
            load_tokenizer_json(spark, p, unk_logprob=True)

    def test_unk_min_ranges_over_all_vocab_scores(self, spark, tmp_path):
        """The library computes kUnkPenalty against the minimum over
        ALL model.vocab scores — including the unk entry and
        added-token pieces the engine excludes from matching (r15
        ADVICE: it used to range over matchable pieces only)."""
        obj = _uni_obj(added_tokens=[
            {"id": 7, "content": "<low>", "special": True},
        ])
        # the added token's own vocab entry holds the global minimum
        obj["model"]["vocab"].append(["<low>", -50.0])
        assert len(obj["model"]["vocab"]) == 9  # <low> at position 8
        obj["added_tokens"][0]["id"] = 8
        m = load_tokenizer_json(spark, _write(tmp_path, "m.json", obj))
        unk = [
            r["logprob"] for r in m.lm.collect() if r["token"] is None
        ]
        assert unk == [-50.0 - UNK_PENALTY]

    def test_decoder_divergence_recorded(self, spark, tmp_path):
        # a WordPiece file carrying a Metaspace decoder: the engine
        # serves the ' ##' join — recorded, never silent
        obj = {
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "decoder": {"type": "Metaspace", "replacement": "▁"},
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "vocab": {t: i for i, t in enumerate(WP_TOKENS)},
            },
        }
        m = load_tokenizer_json(spark, _write(tmp_path, "d.json", obj))
        assert "decoder:Metaspace" in m.divergences
        # ByteLevel decoder under NON-byte-level BPE: recorded too
        obj2 = {
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "decoder": {"type": "ByteLevel"},
            "model": {
                "type": "BPE",
                "vocab": {"a": 0, "b": 1, "ab": 2},
                "merges": ["a b"],
            },
        }
        m2 = load_tokenizer_json(spark, _write(tmp_path, "d2.json", obj2))
        assert "decoder:ByteLevel" in m2.divergences

    def test_decoder_contradiction_raises(self, spark, tmp_path):
        obj = {
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "decoder": {"type": "WordPiece", "prefix": "@@"},
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "vocab": {t: i for i, t in enumerate(WP_TOKENS)},
            },
        }
        with pytest.raises(ValueError, match="decoder prefix"):
            load_tokenizer_json(spark, _write(tmp_path, "c.json", obj))
        obj2 = _uni_obj(
            pre_tokenizer={"type": "Metaspace", "replacement": "▁"},
            decoder={"type": "Metaspace", "replacement": "_"},
        )
        obj2["model"]["vocab"] = [
            ["<unk>", 0.0], ["▁the", -2.0], ["▁a", -3.0],
            ["a", -4.0], ["t", -4.1],
        ]
        with pytest.raises(ValueError, match="does not match"):
            load_tokenizer_json(spark, _write(tmp_path, "c2.json", obj2))

    def test_wordpiece_cleanup_served(self, spark, tmp_path):
        """A stock-BERT-shape decoder (cleanup: true) now SERVES the
        published replace chain instead of recording nothing: ' .'
        folds onto the preceding token."""
        vocab = {t: i for i, t in enumerate(
            ["[UNK]", "it", "don", "##'", "##t", "."]
        )}
        base = {
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "model": {
                "type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "vocab": vocab,
            },
        }
        docs = spark.createDataFrame(
            [(1, "it .")], "doc_id long, text string"
        )
        for cleanup, want in ((True, "it."), (False, "it .")):
            obj = dict(base)
            obj["decoder"] = {
                "type": "WordPiece", "prefix": "##",
                "cleanup": cleanup,
            }
            m = load_tokenizer_json(
                spark, _write(tmp_path, f"w{cleanup}.json", obj)
            )
            assert m.wp_decode_cleanup is cleanup
            assert not any(
                d.startswith("decoder:") for d in m.divergences
            )
            ids = tokenizer_json_token_ids(docs, m, out_col="ids")
            dec = tokenizer_json_decode_ids(
                ids, m, ids_col="ids", out_col="dec"
            )
            assert _col(dec, "dec") == [want]

    def test_wordpiece_cleanup_direct_kernel(self, spark):
        """The kernel-level flag applies the full published chain in
        order (including the \" ' \" middle rule)."""
        from wikiextractor_spark.functions.wordpiece import (
            _wp_decode_one,
        )

        i2t = {0: "do", 1: "##n", 2: "n't", 3: ".", 4: "'", 5: "s",
               6: "it"}
        assert _wp_decode_one([6, 2, 3], i2t, {}, True) == "itn't."
        assert _wp_decode_one([6, 2, 3], i2t, {}, False) == "it n't ."
        assert _wp_decode_one([6, 4, 5], i2t, {}, True) == "it' s"


# -------------------------------------------------------------------------
# r16: unigram byte_fallback — the Llama/Mistral-class layout
# -------------------------------------------------------------------------

def _bf_vocab(marked=True):
    """A byte_fallback model.vocab: unk, all 256 <0xNN> pieces, then
    a small real vocabulary (marker-grain by default)."""
    vocab = [["<unk>", 0.0]]
    vocab += [[f"<0x{b:02X}>", -20.0] for b in range(256)]
    if marked:
        vocab += [
            ["▁the", -2.0], ["▁", -4.5], ["t", -4.0], ["h", -4.1],
            ["e", -3.9],
        ]
    else:
        vocab += [
            ["the", -2.0], ["t", -4.0], ["h", -4.1], ["e", -3.9],
        ]
    return vocab


class TestByteFallback:
    def _llama_obj(self):
        return {
            "normalizer": {
                "type": "Sequence",
                "normalizers": [
                    {"type": "Prepend", "prepend": "▁"},
                    {"type": "Replace",
                     "pattern": {"String": " "}, "content": "▁"},
                ],
            },
            "pre_tokenizer": None,
            "decoder": {
                "type": "Sequence",
                "decoders": [
                    {"type": "Replace",
                     "pattern": {"String": "▁"}, "content": " "},
                    {"type": "ByteFallback"},
                    {"type": "Fuse"},
                    {"type": "Strip", "content": " ",
                     "start": 1, "stop": 0},
                ],
            },
            "model": {
                "type": "Unigram",
                "unk_id": 0,
                "vocab": _bf_vocab(),
                "byte_fallback": True,
            },
        }

    def test_llama_shape_imports_and_serves(self, spark, tmp_path):
        p = _write(tmp_path, "llama_bf.json", self._llama_obj())
        m = load_tokenizer_json(spark, p)
        assert m.family == "unigram"
        assert m.space_marker == "▁"
        # byte→position: <0xNN> sits at position 1 + NN
        assert m.byte_fallback_ids == {b: 1 + b for b in range(256)}
        # the published decoder chain is exactly what the engine
        # decode does — accepted clean
        assert not any(
            d.startswith("decoder:") for d in m.divergences
        )
        docs = spark.createDataFrame(
            [(1, "the héllo"), (2, "😀 the")],
            "doc_id long, text string",
        )
        ids = tokenizer_json_token_ids(docs, m, out_col="ids")
        rows = {r["doc_id"]: r["ids"] for r in ids.collect()}
        # positions: bytes at 1+NN, then ▁the=257+... (marked vocab
        # appended after the byte block in _bf_vocab order)
        pos = {t: i for i, (t, _s) in enumerate(
            self._llama_obj()["model"]["vocab"]
        )}
        he = "héllo".encode("utf-8")
        assert rows[1] == [
            pos["▁the"], pos["▁"], pos["h"],
        ] + [1 + b for b in he[1:3]] + [
            1 + he[3], 1 + he[4], 1 + he[5],
        ]
        # every id in doc 2's emoji falls back to 4 bytes
        em = "😀".encode("utf-8")
        assert rows[2] == [pos["▁"]] + [1 + b for b in em] + [
            pos["▁the"]
        ]
        # decode round-trips the single-spaced text exactly
        dec = tokenizer_json_decode_ids(
            ids, m, ids_col="ids", out_col="t"
        )
        got = {r["doc_id"]: r["t"] for r in dec.collect()}
        assert got == {1: "the héllo", 2: "😀 the"}

    def test_missing_byte_pieces_refuse(self, spark, tmp_path):
        obj = self._llama_obj()
        # drop one byte piece
        obj["model"]["vocab"] = [
            e for e in obj["model"]["vocab"] if e[0] != "<0x7F>"
        ]
        with pytest.raises(ValueError, match="byte pieces are missing"):
            load_tokenizer_json(
                spark, _write(tmp_path, "bad.json", obj)
            )

    def test_byte_piece_as_added_token_refuses(self, spark, tmp_path):
        obj = self._llama_obj()
        obj["added_tokens"] = [
            {"id": 65 + 1, "content": "<0x41>", "special": True},
        ]
        with pytest.raises(ValueError, match="also an added token"):
            load_tokenizer_json(
                spark, _write(tmp_path, "bad2.json", obj)
            )

    def test_export_round_trip(self, spark, tmp_path):
        from wikiextractor_spark.functions.unigram import (
            unigram_from_tokens,
        )

        lm_map = {f"<0x{b:02X}>": -20.0 for b in range(256)}
        lm_map.update({
            "▁the": -2.0, "▁": -4.5, "t": -4.0, "h": -4.1,
            "e": -3.9,
        })
        lm = unigram_from_tokens(spark, lm_map, -30.0)
        p = str(tmp_path / "bf.json")
        save_tokenizer_json_unigram(
            spark, lm, p, space_marker="▁", byte_fallback=True,
        )
        raw = json.loads(_read(spark, p))
        assert raw["model"]["byte_fallback"] is True
        assert raw["decoder"]["type"] == "Sequence"
        m = load_tokenizer_json(spark, p)
        assert m.byte_fallback_ids is not None
        assert not any(
            d.startswith("decoder:") for d in m.divergences
        )
        docs = spark.createDataFrame(
            [(1, "the ✓")], "doc_id long, text string"
        )
        ids = tokenizer_json_token_ids(docs, m, out_col="ids")
        dec = tokenizer_json_decode_ids(
            ids, m, ids_col="ids", out_col="t"
        )
        assert dec.collect()[0]["t"] == "the ✓"
        # re-export byte identity
        p2 = str(tmp_path / "bf2.json")
        save_tokenizer_json_unigram(
            spark, m.lm, p2, space_marker="▁", byte_fallback=True,
        )
        assert _read(spark, p) == _read(spark, p2)

    def test_export_flag_without_pieces_refuses(self, spark, tmp_path):
        from wikiextractor_spark.functions.unigram import (
            unigram_from_tokens,
        )

        lm = unigram_from_tokens(
            spark, {"▁the": -2.0, "▁": -4.0, "t": -4.1}, -10.0
        )
        with pytest.raises(ValueError, match="byte pieces are missing"):
            save_tokenizer_json_unigram(
                spark, lm, str(tmp_path / "x.json"),
                space_marker="▁", byte_fallback=True,
            )


# -------------------------------------------------------------------------
# r16: published word-grain pre_tokenizer blocks on the BPE path
# -------------------------------------------------------------------------

class TestBpePreTokenizerBlocks:
    def test_splitters_match_published_semantics(self):
        """Per-block exactness vs the published grains, hand-stated."""
        import unicodedata as _ud

        from wikiextractor_spark.functions.tokenizer import (
            split_digits_grouped,
            split_digits_individual,
            split_hf_whitespace,
            split_punctuation_isolated,
            split_whitespace_runs,
        )

        ws = split_hf_whitespace
        # Whitespace: \w+|[^\w\s]+ — whitespace dropped, punct runs
        # grouped, underscore is a word char
        assert ws("don't stop, a_b  12x!") == [
            "don", "'", "t", "stop", ",", "a_b", "12x", "!",
        ]
        assert ws("...!?") == ["...!?"]
        # the library's \w includes combining marks (an NFC matra or
        # NFD accent stays in its word) and EXCLUDES No characters
        # like ½ (r16 review — Python re's \w gets both wrong)
        assert ws("का word") == ["का", "word"]
        assert ws(_ud.normalize("NFD", "café!")) == [
            _ud.normalize("NFD", "café"), "!",
        ]
        assert ws("½x") == ["½", "x"]
        # Punctuation(Isolated): every punct char its own token,
        # whitespace NOT removed
        assert split_punctuation_isolated("don't, go") == [
            "don", "'", "t", ",", " go",
        ]
        assert split_punctuation_isolated("a$b") == ["a", "$", "b"]
        # Digits: numeric runs split from non-numeric; individual
        # splits every digit
        assert split_digits_grouped("ab123cd4") == [
            "ab", "123", "cd", "4",
        ]
        assert split_digits_individual("ab123") == [
            "ab", "1", "2", "3",
        ]
        # the library's char::is_numeric is the N* categories — a
        # Han numeral (Lo with Numeric_Type) is NOT split (r16
        # review: str.isnumeric wrongly admitted it), while ½ (No)
        # and Ⅻ (Nl) are numeric
        assert split_digits_grouped("第一章 12") == ["第一章 ", "12"]
        assert split_digits_grouped("x½Ⅻy") == ["x", "½Ⅻ", "y"]
        # WhitespaceSplit callable: the engine grain
        assert split_whitespace_runs(" a  b\tc ") == ["a", "b", "c"]

    def test_sequence_composition(self):
        from wikiextractor_spark.functions.tokenizer import (
            _compile_pretok,
            split_digits_individual,
            split_hf_whitespace,
        )

        seq = _compile_pretok(
            (split_hf_whitespace, split_digits_individual)
        )
        assert seq("ab12 cd! e3f") == [
            "ab", "1", "2", "cd", "!", "e", "3", "f",
        ]

    def test_whitespace_grain_file_serves(self, spark, tmp_path):
        """A Whitespace-grain tokenizer.json (the default for many
        custom HF tokenizers) imports and serves: punctuation splits
        from words WITHOUT surrounding whitespace, merges replay
        inside each pre-token."""
        vocab = {t: i for i, t in enumerate(
            ["t", "h", "e", ",", "!", "th", "the"]
        )}
        obj = {
            "pre_tokenizer": {"type": "Whitespace"},
            "model": {
                "type": "BPE", "vocab": vocab,
                "merges": ["t h", "th e"],
            },
        }
        m = load_tokenizer_json(
            spark, _write(tmp_path, "ws.json", obj),
            oov_tokens_per_char=1.0,
        )
        assert m.bpe_pre_tokenizer is not None
        assert m.divergences == ()
        docs = spark.createDataFrame(
            [(1, "the, the!"), (2, "the,the")],
            "doc_id long, text string",
        )
        ids = tokenizer_json_token_ids(docs, m, out_col="ids")
        rows = {r["doc_id"]: r["ids"] for r in ids.collect()}
        V = vocab
        # 'the,' under the WHITESPACE-grain engine default would be
        # one word (no ',' split); under Whitespace it is two
        # pre-tokens — the grain difference this upgrade serves
        assert rows[1] == [V["the"], V[","], V["the"], V["!"]]
        assert rows[2] == [V["the"], V[","], V["the"]]

    def test_sequence_file_and_digits(self, spark, tmp_path):
        vocab = {t: i for i, t in enumerate(
            ["a", "b", "1", "2", "ab"]
        )}
        obj = {
            "pre_tokenizer": {
                "type": "Sequence",
                "pretokenizers": [
                    {"type": "Whitespace"},
                    {"type": "Digits", "individual_digits": True},
                ],
            },
            "model": {
                "type": "BPE", "vocab": vocab, "merges": ["a b"],
            },
        }
        m = load_tokenizer_json(
            spark, _write(tmp_path, "seq.json", obj)
        )
        docs = spark.createDataFrame(
            [(1, "ab12 ab")], "doc_id long, text string"
        )
        ids = tokenizer_json_token_ids(docs, m, out_col="ids")
        V = vocab
        assert ids.collect()[0]["ids"] == [
            V["ab"], V["1"], V["2"], V["ab"],
        ]

    def test_unsupported_options_still_raise(self, spark, tmp_path):
        base = {
            "model": {
                "type": "BPE", "vocab": {"a": 0, "b": 1, "ab": 2},
                "merges": ["a b"],
            },
        }
        obj = dict(base)
        obj["pre_tokenizer"] = {
            "type": "Punctuation", "behavior": "Removed",
        }
        with pytest.raises(ValueError, match="behavior"):
            load_tokenizer_json(spark, _write(tmp_path, "p.json", obj))
        obj["pre_tokenizer"] = {"type": "Split", "pattern": "x"}
        with pytest.raises(ValueError, match="unsupported BPE"):
            load_tokenizer_json(spark, _write(tmp_path, "s.json", obj))


# -------------------------------------------------------------------------
# r16: the truncation block served
# -------------------------------------------------------------------------

def _iter_longest_first(la, lb, budget):
    """The published truncate_encodings loop, verbatim: trim one
    token at a time from whichever sequence is currently longer
    (ties trim the second)."""
    ka, kb = la, lb
    while ka + kb > budget:
        if ka > kb:
            ka -= 1
        else:
            kb -= 1
    return ka, kb


class TestTruncation:
    PAIR_PP = {
        "type": "TemplateProcessing",
        "single": [
            {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
            {"Sequence": {"id": "A", "type_id": 0}},
            {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
        ],
        "pair": [
            {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
            {"Sequence": {"id": "A", "type_id": 0}},
            {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
            {"Sequence": {"id": "B", "type_id": 1}},
            {"SpecialToken": {"id": "[SEP]", "type_id": 1}},
        ],
        "special_tokens": {
            "[CLS]": {"id": "[CLS]", "ids": [100],
                      "tokens": ["[CLS]"]},
            "[SEP]": {"id": "[SEP]", "ids": [101],
                      "tokens": ["[SEP]"]},
        },
    }

    def _file(self, tmp_path, truncation, name="t.json"):
        # single-char unigram vocab a..f at positions 1..6
        obj = {
            "added_tokens": [
                {"id": 100, "content": "[CLS]", "special": True},
                {"id": 101, "content": "[SEP]", "special": True},
            ],
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "post_processor": self.PAIR_PP,
            "truncation": truncation,
            "model": {
                "type": "Unigram", "unk_id": 0,
                "vocab": [["<unk>", 0.0]] + [
                    [c, -4.0 - i * 0.1]
                    for i, c in enumerate("abcdef")
                ],
            },
        }
        return _write(tmp_path, name, obj)

    def test_closed_form_matches_published_loop(self):
        """ka = min(la, max(ceil(b/2), b - lb)) == the iterative
        published rule, over an exhaustive grid."""
        for b in range(0, 12):
            half = (b + 1) // 2
            for la in range(0, 15):
                for lb in range(0, 15):
                    if la + lb <= b:
                        continue
                    ka = min(la, max(half, b - lb))
                    assert (ka, b - ka) == _iter_longest_first(
                        la, lb, b
                    ), (la, lb, b)

    def test_pair_longest_first(self, spark, tmp_path):
        p = self._file(
            tmp_path,
            {"max_length": 9, "strategy": "LongestFirst",
             "stride": 0, "direction": "Right"},
        )
        m = load_tokenizer_json(spark, p)
        assert m.truncation == ("LongestFirst", 9)
        assert "truncation" not in m.divergences
        docs = spark.createDataFrame(
            [
                (1, "a b c d e f", "a b"),        # la=6 lb=2 → 4,2
                (2, "a b", "c d e f a b"),        # la=2 lb=6 → 2,4
                (3, "a b c d e", "f a b c d"),    # 5,5 → 3,3
                (4, "a b", "c d"),                # fits whole
                (5, None, "a"),
            ],
            "doc_id long, text_a string, text_b string",
        )
        out = tokenizer_json_encode_pairs(docs, m)
        rows = {
            r["doc_id"]: (r["input_ids"], r["token_type_ids"])
            for r in out.collect()
        }
        # budget = 9 - 3 specials = 6; positions: a..f → 1..6
        A = {c: i + 1 for i, c in enumerate("abcdef")}
        assert rows[1][0] == [100, A["a"], A["b"], A["c"], A["d"],
                              101, A["a"], A["b"], 101]
        assert rows[2][0] == [100, A["a"], A["b"], 101,
                              A["c"], A["d"], A["e"], A["f"], 101]
        assert rows[3][0] == [100, A["a"], A["b"], A["c"], 101,
                              A["f"], A["a"], A["b"], 101]
        assert rows[3][1] == [0, 0, 0, 0, 0, 1, 1, 1, 1]
        assert rows[4][0] == [100, A["a"], A["b"], 101,
                              A["c"], A["d"], 101]
        assert rows[5] == (None, None)
        # every emitted stream fits max_length
        for d in (1, 2, 3, 4):
            assert len(rows[d][0]) <= 9
            assert len(rows[d][0]) == len(rows[d][1])

    def test_pair_only_first_and_second(self, spark, tmp_path):
        p = self._file(
            tmp_path, {"max_length": 7, "strategy": "OnlyFirst"}
        )
        m = load_tokenizer_json(spark, p)
        docs = spark.createDataFrame(
            [(1, "a b c d e", "f a")],
            "doc_id long, text_a string, text_b string",
        )
        out = tokenizer_json_encode_pairs(docs, m)
        A = {c: i + 1 for i, c in enumerate("abcdef")}
        # budget 4: B keeps 2, A trims to 2
        assert out.collect()[0]["input_ids"] == [
            100, A["a"], A["b"], 101, A["f"], A["a"], 101,
        ]
        # the published error: the untrimmed side alone overflows
        bad = spark.createDataFrame(
            [(1, "a", "a b c d e f")],
            "doc_id long, text_a string, text_b string",
        )
        with pytest.raises(Exception, match="OnlyFirst truncation"):
            tokenizer_json_encode_pairs(bad, m).collect()
        p2 = self._file(
            tmp_path, {"max_length": 7, "strategy": "OnlySecond"},
            name="t2.json",
        )
        m2 = load_tokenizer_json(spark, p2)
        out2 = tokenizer_json_encode_pairs(docs.limit(0), m2)
        assert out2.count() == 0  # plan builds; strategy symmetric
        ok2 = spark.createDataFrame(
            [(1, "a b", "c d e f a")],
            "doc_id long, text_a string, text_b string",
        )
        assert tokenizer_json_encode_pairs(ok2, m2).collect()[0][
            "input_ids"
        ] == [100, A["a"], A["b"], 101, A["c"], A["d"], 101]

    def test_single_encode_truncates_with_template(self, spark,
                                                   tmp_path):
        p = self._file(
            tmp_path, {"max_length": 5, "strategy": "LongestFirst"}
        )
        m = load_tokenizer_json(spark, p)
        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a"), (3, None)],
            "doc_id long, text string",
        )
        A = {c: i + 1 for i, c in enumerate("abcdef")}
        out = tokenizer_json_token_ids(docs, m, out_col="ids")
        rows = {r["doc_id"]: r["ids"] for r in out.collect()}
        # budget = 5 - 2 template specials = 3
        assert rows[1] == [100, A["a"], A["b"], A["c"], 101]
        assert rows[2] == [100, A["a"], 101]
        assert rows[3] is None
        # without specials the whole budget goes to the body
        bare = tokenizer_json_token_ids(
            docs, m, out_col="ids", add_special_tokens=False
        )
        assert {r["doc_id"]: r["ids"] for r in bare.collect()}[1] == [
            A["a"], A["b"], A["c"], A["d"], A["e"],
        ]

    def test_single_only_second_raises(self, spark, tmp_path):
        p = self._file(
            tmp_path, {"max_length": 5, "strategy": "OnlySecond"}
        )
        m = load_tokenizer_json(spark, p)
        docs = spark.createDataFrame(
            [(1, "a")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="no second sequence"):
            tokenizer_json_token_ids(docs, m)

    def test_unservable_options_fall_back_recorded(self, spark,
                                                   tmp_path):
        p = self._file(
            tmp_path,
            {"max_length": 5, "strategy": "LongestFirst",
             "stride": 2},
        )
        m = load_tokenizer_json(spark, p)
        assert m.truncation is None
        assert "truncation:stride" in m.divergences
        p2 = self._file(
            tmp_path,
            {"max_length": 5, "direction": "Left"}, name="l.json",
        )
        m2 = load_tokenizer_json(spark, p2)
        assert m2.truncation is None
        assert "truncation:direction" in m2.divergences
        with pytest.raises(ValueError, match="max_length"):
            load_tokenizer_json(
                spark,
                self._file(tmp_path, {"max_length": 0},
                           name="z.json"),
            )


# -------------------------------------------------------------------------
# r16: the Precompiled charsmap as the NFKC kernel
# -------------------------------------------------------------------------

class TestNfkcCharsmap:
    def _obj(self):
        return {
            "normalizer": {"type": "Precompiled",
                           "precompiled_charsmap": "b64blob"},
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "model": {
                "type": "Unigram", "unk_id": 0,
                "vocab": [
                    ["<unk>", 0.0], ["fi", -2.0], ["a", -3.0],
                    ["1", -3.1], ["2", -3.2], ["f", -4.0],
                    ["i", -4.1],
                ],
            },
        }

    def test_nfkc_mode_serves_folded_text(self, spark, tmp_path):
        p = _write(tmp_path, "t5.json", self._obj())
        m = load_tokenizer_json(spark, p, charsmap="nfkc")
        assert m.normalize_nfkc is True
        assert "normalizer:Precompiled" not in m.divergences
        docs = spark.createDataFrame(
            # U+FB01 ligature, full-width digits — NFKC folds both
            [(1, "ﬁa １２")], "doc_id long, text string",
        )
        ids = tokenizer_json_token_ids(docs, m, out_col="ids")
        # positions: fi=1 a=2 1=3 2=4
        assert ids.collect()[0]["ids"] == [1, 2, 3, 4]
        # the default mode serves the raw text: ligature and
        # full-width digits are unknown characters
        m0 = load_tokenizer_json(spark, p)
        assert m0.normalize_nfkc is False
        assert "normalizer:Precompiled" in m0.divergences
        ids0 = tokenizer_json_token_ids(docs, m0, out_col="ids")
        assert ids0.collect()[0]["ids"] == [-1, 2, -1, -1]

    def test_nfkc_after_added_token_split(self, spark, tmp_path):
        """The published order: added tokens split from the RAW text
        — a special whose literal would be NFKC-mangled still
        matches."""
        obj = self._obj()
        obj["added_tokens"] = [
            {"id": 50, "content": "<ﬁ>", "special": True},
        ]
        p = _write(tmp_path, "sp.json", obj)
        m = load_tokenizer_json(spark, p, charsmap="nfkc")
        docs = spark.createDataFrame(
            [(1, "fia<ﬁ>ﬁa")], "doc_id long, text string",
        )
        ids = tokenizer_json_token_ids(docs, m, out_col="ids")
        assert ids.collect()[0]["ids"] == [1, 2, 50, 1, 2]

    def test_charsmap_value_validated(self, spark, tmp_path):
        p = _write(tmp_path, "v.json", self._obj())
        with pytest.raises(ValueError, match="charsmap"):
            load_tokenizer_json(spark, p, charsmap="sp")
