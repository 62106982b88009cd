"""HuggingFace ``tokenizer.json`` single-file IMPORT/EXPORT — the
published one-file serialization of the ``tokenizers`` library
(huggingface/tokenizers; the layout every ``AutoTokenizer`` ships):
one JSON object with a ``model`` block (``type`` BPE | WordPiece |
Unigram), the ``added_tokens`` overlay, and normalizer /
pre_tokenizer / post_processor / decoder component blocks.  This
module maps that file to and from the engine's per-family artifact
frames + kernel flags, completing the train-here/serve-anywhere
interchange story the r15 per-format exporters (merges.txt /
vocab.json / vocab.txt / .vocab TSV) started: ONE file now carries
the whole serving configuration — family, grain, vocabulary, merges,
added tokens — instead of two artifacts plus out-of-band flags.

Import policy (the engine-wide raise-don't-guess discipline):

* component blocks the engine can serve FAITHFULLY map to kernel
  flags — ``ByteLevel`` pre-tokenization → the GPT-2 byte-level
  replay, ``BertNormalizer``/``BertPreTokenizer`` → the
  :func:`~wikiextractor_spark.functions.wordpiece.
  basic_tokenize_text` grain, ``Metaspace`` (and the Llama-shape
  ``Prepend`` + ``Replace`` normalizer pair) → the unigram
  ``space_marker`` mode;
* blocks that would change the TOKEN STREAM in ways the engine
  cannot reproduce RAISE (``ignore_merges``, BPE dropout or
  ``byte_fallback``, a non-``##`` WordPiece continuation prefix);
  Unigram ``byte_fallback: true`` SERVES (r16, the Llama/Mistral-
  class layout): uncovered characters re-encode as their UTF-8
  bytes' ``<0xNN>`` piece ids, required present for all 256 bytes;
* the post_processor's SINGLE-SEQUENCE shapes serve FAITHFULLY
  (r15): ``TemplateProcessing.single``, ``BertProcessing``, and
  ``RobertaProcessing`` become prefix/suffix template ids applied as
  one native array concat around the body (``add_special_tokens``
  on the dispatch mirrors the published encode flag);
* blocks that are stated engine divergences elsewhere are ACCEPTED
  and recorded on the returned model's ``divergences`` tuple: an
  UNPARSEABLE pair template shape, the SentencePiece
  ``Precompiled`` charsmap normalizer under the default
  ``charsmap='record'`` (pass ``charsmap='nfkc'`` to serve the
  standard charsmap through the engine's NFKC kernel — r16), a
  ``truncation`` block carrying ``stride``/``direction`` options
  the engine cannot honor (the three published strategies
  themselves SERVE as native slices — r16), the ``padding`` block,
  added-token matching flags (``lstrip``/``rstrip``/
  ``single_word``/``normalized`` — r16), and decoder blocks the
  decode dispatch does not reproduce (r16; the stock WordPiece
  ``cleanup: true``, the ByteLevel decoder, the Metaspace decoder,
  and the Llama-shape Sequence chain all serve faithfully).
  ``BertNormalizer``'s ``clean_text``/``handle_chinese_chars``
  SERVE since r16 (:func:`~wikiextractor_spark.functions.wordpiece.
  basic_tokenize_text` steps).

Unigram unk rule: the published implementation does NOT serve the
unk entry's stored score — it assigns unknown characters
``min(piece scores) - 10.0`` (the library's ``kUnkPenalty``
constant; SentencePiece's own default penalty).  Import applies that
rule (or an explicit ``unk_logprob=`` override, the
:func:`~wikiextractor_spark.functions.unigram.load_unigram_lm`
convention); export writes the unk entry with score ``0.0`` at
``unk_id`` 0 (the SentencePiece layout) — the engine scalar is not
expressible in the format, stated.  Unknown handling stays at the
engine grain: one UNK per unknown CHARACTER, never fused runs.

Scale shape: the file is a driver-sized artifact — FS-agnostic
one-file read/write through the same Hadoop FileSystem routes as
every other published-format importer/exporter; the returned frames
are eagerly checkpointed so they outlive the source file, and
serving goes through the existing broadcast Arrow kernels unchanged.

No reference counterpart — engine extension (SURVEY.md §2.12)."""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from wikiextractor_spark.localframe import local_rows_df

from wikiextractor_spark.functions.tokenizer import (
    VOCAB_SCHEMA,
    _bad_tokens,
    _check_embedding_id,
    _merge_sides,
    _vocab_id_maps,
    _whole_text_artifact,
)

#: the published kUnkPenalty of huggingface/tokenizers' Unigram model
#: (and SentencePiece's default --unk_penalty): unknown characters
#: score ``min(piece scores) - UNK_PENALTY``, never the unk entry's
#: stored score (typically 0.0, which would otherwise DOMINATE every
#: real logprob and segment whole corpora as unk)
UNK_PENALTY = 10.0


@dataclass(frozen=True)
class TokenizerJsonModel:
    """A loaded ``tokenizer.json`` mapped to engine serving state:
    the per-family artifact frame(s) plus the kernel flags the file's
    component blocks imply.  Feed it to
    :func:`tokenizer_json_token_ids` / :func:`tokenizer_json_decode_
    ids`, or pick the fields apart for direct kernel calls."""

    family: str  # 'bpe' | 'wordpiece' | 'unigram'
    #: bpe/wordpiece vocabulary frame (bpe: incl. the NULL-token OOV
    #: row); None for unigram
    vocab: DataFrame | None = None
    #: bpe rank map {(left, right): rank}; None otherwise
    merges: dict | None = None
    #: unigram LM frame incl. the NULL-token unk row; None otherwise
    lm: DataFrame | None = None
    #: unigram published numbering {piece: file position}; None
    #: otherwise
    token_ids: dict | None = None
    #: {text: id} of every added_tokens entry (the serving kernels'
    #: special_tokens overlay); None when the file has none
    special_tokens: dict | None = None
    byte_level: bool = False          # bpe ByteLevel grain
    #: BPE word-grain pre-tokenization (r16): a pattern string, a
    #: picklable splitter, or a tuple applied successively — the
    #: published Whitespace / Punctuation / Digits / Sequence blocks
    #: mapped onto the kernel hook; None for the engine whitespace
    #: grain / ByteLevel
    bpe_pre_tokenizer: object = None
    basic_tokenize: bool = False      # wordpiece BertNormalizer grain
    lower: bool = True                # wordpiece basic grain flags
    strip_accents: bool = True
    #: the BertNormalizer clean_text / handle_chinese_chars flags
    #: (r16, now SERVED: the published control/format removal and
    #: per-CJK-char spacing); False outside the basic grain
    clean_text: bool = False
    handle_chinese_chars: bool = False
    space_marker: str | None = None   # unigram Metaspace grain
    #: serve NFKC normalization per segment before the unigram
    #: kernel (r16): the ``charsmap='nfkc'`` import mode for
    #: SentencePiece ``Precompiled`` normalizers — runs INSIDE the
    #: kernel after the added-token split (the published order)
    normalize_nfkc: bool = False
    #: unigram byte fallback (r16): ``{byte: <0xNN> piece position}``
    #: over all 256 bytes — the Llama/Mistral-class published
    #: fallback; None when the file's ``model.byte_fallback`` is off
    byte_fallback_ids: dict | None = None
    unk_token: str | None = None      # wordpiece unk entry text
    max_input_chars_per_word: int = 100
    #: post_processor template ids around the body (r15): the
    #: single-sequence TemplateProcessing / BertProcessing /
    #: RobertaProcessing shapes serve FAITHFULLY — prefix ids, then
    #: the tokenized body, then suffix ids (a native array concat)
    template_prefix: tuple = ()
    template_suffix: tuple = ()
    #: the PAIR template parsed element-wise (r15):
    #: ``('special', id, type_id)`` / ``('A', None, type_id)`` /
    #: ``('B', None, type_id)`` in template order — the
    #: :func:`tokenizer_json_encode_pairs` serving plan; empty when
    #: the file has no (parseable) pair template
    pair_elements: tuple = ()
    #: the file's ``truncation`` block served (r16): ``(strategy,
    #: max_length)`` with strategy LongestFirst | OnlyFirst |
    #: OnlySecond — applied by the encode dispatches as native array
    #: slices, budget = max_length minus the template's special
    #: count (the published pre-post-processing accounting); None
    #: when the file has none or the block fell back to a recorded
    #: divergence (stride/direction options the engine cannot honor)
    truncation: tuple | None = None
    #: the file's WordPiece decoder ``cleanup`` flag (r16): True
    #: serves the published fixed replace chain on decode
    #: (:func:`~wikiextractor_spark.functions.wordpiece.
    #: wordpiece_decode_ids` ``cleanup=True`` — stock BERT files
    #: carry it)
    wp_decode_cleanup: bool = False
    #: component blocks accepted with a STATED divergence (see module
    #: docstring), e.g. ('post_processor:pair',
    #: 'normalizer:Precompiled')
    divergences: tuple = ()


# --------------------------------------------------------------------------
# import
# --------------------------------------------------------------------------

def _block(obj, name: str, caller: str):
    """A component block: None, or a dict with a string ``type``."""
    b = obj.get(name)
    if b is None:
        return None
    if not isinstance(b, dict) or not isinstance(b.get("type"), str):
        raise ValueError(
            f"{caller}: {name} block must be null or an object with "
            f"a string 'type', got {b!r}"
        )
    return b


def _flatten(block, name: str, caller: str) -> list[dict]:
    """A component block flattened: ``Sequence`` blocks contribute
    their members (one level — the serialized files never nest
    deeper), everything else is itself."""
    if block is None:
        return []
    if block["type"] == "Sequence":
        key = (
            "pretokenizers" if name == "pre_tokenizer"
            else "normalizers"
        )
        members = block.get(key)
        if not isinstance(members, list):
            raise ValueError(
                f"{caller}: {name} Sequence block carries no "
                f"{key} list"
            )
        out = []
        for m in members:
            if not isinstance(m, dict) or not isinstance(
                m.get("type"), str
            ):
                raise ValueError(
                    f"{caller}: malformed {name} Sequence member "
                    f"{m!r}"
                )
            out.append(m)
        return out
    return [block]


def _added_tokens(
    obj, caller: str, divergences: list,
) -> dict[str, int] | None:
    """The ``added_tokens`` overlay as the kernels' ``{text: id}``
    special-token mapping.  The engine's literal pre-split + reserved
    id IS the library's default added-token matching; the MATCHING
    flags the library layers on top are NOT reproduced and are
    RECORDED per flag kind (r16, the r15 ADVICE finding — they used
    to pass silently / docstring-only):

    * ``lstrip``/``rstrip`` true (RoBERTa's ``<mask>`` ships
      ``lstrip: true``): the library's match consumes adjacent
      whitespace into the token; the engine splits the literal text
      only, so a ``" <mask>"`` id stream keeps the space in the
      neighboring segment — ``added_tokens:lstrip``/``:rstrip``;
    * ``single_word`` true: the library matches only at word
      boundaries; the engine matches the literal anywhere —
      ``added_tokens:single_word``;
    * ``normalized`` true: the library normalizes the token text
      before matching; the engine serves it literally (normalize
      upstream) — ``added_tokens:normalized``."""
    toks = obj.get("added_tokens")
    if toks is None:
        return None
    if not isinstance(toks, list):
        raise ValueError(
            f"{caller}: added_tokens must be a list, got {toks!r}"
        )
    out: dict[str, int] = {}
    flagged: dict[str, str] = {}  # flag kind -> first offending text
    for t in toks:
        if not isinstance(t, dict) or not isinstance(
            t.get("content"), str
        ) or t["content"] == "":
            raise ValueError(
                f"{caller}: malformed added_tokens entry {t!r} — "
                "need a non-empty string 'content' and an 'id'"
            )
        c = t["content"]
        if c in out:
            raise ValueError(
                f"{caller}: duplicate added token {c!r}"
            )
        out[c] = _check_embedding_id(
            caller, f"added token {c!r}", t.get("id")
        )
        for flag in ("single_word", "lstrip", "rstrip", "normalized"):
            if t.get(flag) is True:
                flagged.setdefault(flag, c)
    for flag in ("single_word", "lstrip", "rstrip", "normalized"):
        if flag in flagged:
            divergences.append(
                f"added_tokens:{flag}({flagged[flag]!r})"
            )
    if len(set(out.values())) != len(out):
        raise ValueError(f"{caller}: duplicate added-token ids")
    return out or None


def _vocab_dict(model: dict, caller: str) -> dict[str, int]:
    """The BPE/WordPiece ``model.vocab`` object validated to the
    engine vocabulary shape (the :func:`~wikiextractor_spark.
    functions.tokenizer.load_bpe_vocab_json` rules)."""
    vocab = model.get("vocab")
    if not isinstance(vocab, dict) or not vocab:
        raise ValueError(
            f"{caller}: model.vocab must be one non-empty object "
            "{token: id}"
        )
    shape_bad = _bad_tokens(vocab)
    if shape_bad:
        raise ValueError(
            f"{caller}: {len(shape_bad)} empty or "
            f"whitespace-carrying vocab tokens (first: "
            f"{shape_bad[0]!r})"
        )
    out = {
        t: _check_embedding_id(caller, f"token {t!r}", i)
        for t, i in vocab.items()
    }
    if len(set(out.values())) != len(out):
        raise ValueError(f"{caller}: duplicate vocab ids")
    return out


def _merge_pairs(model: dict, caller: str) -> dict:
    """The BPE ``model.merges`` list — ``"left right"`` strings (the
    classic serialization) or ``[left, right]`` pairs (the current
    one) — as the engine's rank map, rank = list order (the
    :func:`~wikiextractor_spark.functions.tokenizer.
    load_bpe_merges_txt` rules)."""
    merges = model.get("merges")
    if not isinstance(merges, list) or not merges:
        raise ValueError(
            f"{caller}: model.merges must be a non-empty list"
        )
    ranks: dict[tuple[str, str], float] = {}
    for i, m in enumerate(merges):
        if isinstance(m, str):
            key = _merge_sides(m)
        elif (
            isinstance(m, (list, tuple)) and len(m) == 2
            and all(isinstance(s, str) for s in m)
        ):
            key = _merge_sides(f"{m[0]} {m[1]}")
        else:
            key = None
        if key is None:
            raise ValueError(
                f"{caller}: malformed merges entry {i}: {m!r} — "
                "need 'left right' or [left, right] with non-empty "
                "whitespace-free sides"
            )
        if key in ranks:
            raise ValueError(
                f"{caller}: duplicate merge pair at entry {i}: {m!r}"
            )
        ranks[key] = float(len(ranks))
    return ranks


def _resolve_template_special(
    name, sp_map: dict, caller: str,
) -> int:
    """A template SpecialToken resolved through the block's own
    ``special_tokens`` id table — must map to exactly ONE id."""
    ent = sp_map.get(name)
    ids = ent.get("ids") if isinstance(ent, dict) else None
    if not isinstance(ids, list) or len(ids) != 1:
        raise ValueError(
            f"{caller}: template special {name!r} must resolve to "
            "exactly one id through the block's special_tokens "
            f"table, got {ids!r}"
        )
    return _check_embedding_id(
        caller, f"template special {name!r}", ids[0]
    )


def _check_type_id(v, what: str, caller: str) -> int:
    """A template ``type_id``: absent/None → 0 (the serde default),
    otherwise a non-negative integral number — fractional or
    non-numeric values raise with context (the raise-don't-guess
    contract; ``int()`` coercion would silently truncate 1.7 and
    crash bare on strings)."""
    if v is None:
        return 0
    bad = isinstance(v, bool) or not isinstance(v, (int, float))
    if not bad and isinstance(v, float):
        # floats checked separately: json accepts Infinity/NaN/1e999
        # literals, and int(inf) raises a bare OverflowError with no
        # context — while a huge INT literal is integral and must
        # not be pushed through float() (same overflow, other
        # direction; r15 third review)
        bad = not math.isfinite(v) or v != int(v)
    if bad or int(v) < 0:
        raise ValueError(
            f"{caller}: {what} has invalid type_id {v!r} — "
            "type ids are non-negative integers"
        )
    return int(v)


def _parse_pair_template(pp: dict, caller: str) -> tuple | None:
    """The ``pair`` template parsed element-wise to the
    :func:`tokenizer_json_encode_pairs` plan — ``('special', id,
    type_id)`` / ``('A'|'B', None, type_id)``, sequences A and B
    each exactly once.  None (→ the stated pair divergence) when the
    shape is not the element list this parser serves; malformed
    SPECIALS inside a well-shaped list still raise (a corrupt id
    table must not demote to a divergence)."""
    pair = pp.get("pair")
    if not isinstance(pair, list) or not pair:
        return None
    sp_map = pp.get("special_tokens") or {}
    out: list[tuple] = []
    seen: set[str] = set()
    for el in pair:
        if not isinstance(el, dict) or len(el) != 1:
            return None
        if "Sequence" in el:
            seq = el["Sequence"]
            sid = seq.get("id") if isinstance(seq, dict) else None
            if sid not in ("A", "B") or sid in seen:
                return None
            seen.add(sid)
            out.append((
                sid, None,
                _check_type_id(
                    seq.get("type_id"), f"pair sequence {sid}",
                    caller,
                ),
            ))
        elif "SpecialToken" in el:
            st = el["SpecialToken"]
            out.append((
                "special",
                _resolve_template_special(
                    st.get("id"), sp_map, caller
                ),
                _check_type_id(
                    st.get("type_id"),
                    f"pair special {st.get('id')!r}", caller,
                ),
            ))
        else:
            return None
    if seen != {"A", "B"}:
        return None
    return tuple(out)


def _template_ids(
    obj: dict, caller: str,
) -> tuple[tuple, tuple, tuple, list[str]]:
    """The post_processor block as ``(prefix ids, suffix ids, pair
    elements, divergences)`` — the template serving upgrade (r15):

    * ``null`` and ``ByteLevel`` (offsets-only, no id-stream effect)
      → no template, no divergence;
    * ``BertProcessing`` / ``RobertaProcessing`` → their cls/sep
      entries as one prefix and one suffix id, plus the published
      pair layouts ([CLS] A [SEP] B [SEP] types 0/1; <s> A </s>
      </s> B </s> types all 0);
    * ``TemplateProcessing`` → the ``single`` template parsed
      element-wise (specials resolved through the block's own
      ``special_tokens`` id table; each must resolve to exactly ONE
      id) and the ``pair`` template parsed to encode-pairs elements
      when its shape allows — an unparseable pair stays the stated
      divergence;
    * anything else → recorded as the stated ``post_processor``
      divergence (the pre-upgrade behavior)."""
    pp = obj.get("post_processor")
    if pp is None:
        return (), (), (), []
    if not isinstance(pp, dict) or not isinstance(pp.get("type"), str):
        raise ValueError(
            f"{caller}: post_processor must be null or an object "
            f"with a string 'type', got {pp!r}"
        )
    t = pp["type"]
    if t == "ByteLevel":
        return (), (), (), []
    if t == "Sequence":
        # the current serialization wraps ByteLevel +
        # TemplateProcessing in a Sequence — same semantics as the
        # bare blocks, parsed member-wise (r15 review: the older
        # RobertaProcessing form of the SAME model must not serve a
        # different stream than its modern serialization)
        members = pp.get("processors")
        if not isinstance(members, list):
            raise ValueError(
                f"{caller}: post_processor Sequence block carries "
                "no processors list"
            )
        tmpl = None
        divs: list[str] = []
        for m in members:
            if not isinstance(m, dict) or not isinstance(
                m.get("type"), str
            ):
                raise ValueError(
                    f"{caller}: malformed post_processor Sequence "
                    f"member {m!r}"
                )
            if m["type"] == "ByteLevel":
                continue
            if (
                m["type"] in (
                    "TemplateProcessing", "BertProcessing",
                    "RobertaProcessing",
                )
                and tmpl is None
            ):
                tmpl = m
                continue
            divs.append(f"post_processor:{m['type']}")
        if tmpl is None:
            return (), (), (), divs
        pre, suf, pair_els, d2 = _template_ids(
            {"post_processor": tmpl}, caller
        )
        return pre, suf, pair_els, divs + d2
    if t in ("BertProcessing", "RobertaProcessing"):
        out = []
        for k in ("cls", "sep"):
            e = pp.get(k)
            if (
                not isinstance(e, (list, tuple)) or len(e) != 2
                or not isinstance(e[0], str)
            ):
                raise ValueError(
                    f"{caller}: {t}.{k} must be [token, id], got "
                    f"{e!r}"
                )
            out.append(
                _check_embedding_id(caller, f"{t}.{k}", e[1])
            )
        cls_id, sep_id = out
        if t == "BertProcessing":
            # the published pair layout: [CLS] A [SEP] B [SEP],
            # token_type_ids 0 over the first segment, 1 over the
            # second (incl. its trailing [SEP])
            pair_els = (
                ("special", cls_id, 0), ("A", None, 0),
                ("special", sep_id, 0), ("B", None, 1),
                ("special", sep_id, 1),
            )
        else:
            # RoBERTa: <s> A </s> </s> B </s>, all type 0
            pair_els = (
                ("special", cls_id, 0), ("A", None, 0),
                ("special", sep_id, 0), ("special", sep_id, 0),
                ("B", None, 0), ("special", sep_id, 0),
            )
        return (cls_id,), (sep_id,), pair_els, []
    if t == "TemplateProcessing":
        single = pp.get("single")
        if not isinstance(single, list) or not single:
            raise ValueError(
                f"{caller}: TemplateProcessing.single must be a "
                "non-empty element list"
            )
        sp_map = pp.get("special_tokens") or {}
        prefix: list[int] = []
        suffix: list[int] = []
        seen_seq = False
        for el in single:
            if not isinstance(el, dict) or len(el) != 1:
                raise ValueError(
                    f"{caller}: malformed template element {el!r}"
                )
            if "Sequence" in el:
                seq = el["Sequence"]
                if not isinstance(seq, dict) or seq.get("id") != "A":
                    raise ValueError(
                        f"{caller}: the single template must "
                        f"reference sequence A, got {seq!r}"
                    )
                if seen_seq:
                    raise ValueError(
                        f"{caller}: the single template references "
                        "sequence A twice"
                    )
                seen_seq = True
            elif "SpecialToken" in el:
                (suffix if seen_seq else prefix).append(
                    _resolve_template_special(
                        el["SpecialToken"].get("id"), sp_map, caller
                    )
                )
            else:
                raise ValueError(
                    f"{caller}: unsupported template element "
                    f"{el!r} — Sequence and SpecialToken only"
                )
        if not seen_seq:
            raise ValueError(
                f"{caller}: the single template never references "
                "sequence A — the body would be dropped"
            )
        pair_els = _parse_pair_template(pp, caller)
        divs = (
            ["post_processor:pair"]
            if pp.get("pair") and pair_els is None else []
        )
        return tuple(prefix), tuple(suffix), pair_els or (), divs
    return (), (), (), ["post_processor"]


def _check_added_vs_vocab(
    vd: dict[str, int], specials: dict[str, int] | None, caller: str,
) -> None:
    """Fail-fast collision policy at LOAD time, the serve-side
    :func:`~wikiextractor_spark.functions.tokenizer._vocab_id_maps`
    rules restated on the file's objects: an added token whose text
    is also a vocab entry must AGREE on the id (the published
    special-in-vocab layout), and an added id must not collide with
    a DIFFERENT vocab token's id — a corrupt file raises here with
    the file-shape message, not later inside a kernel."""
    if not specials:
        return
    by_id = {i: t for t, i in vd.items()}
    for t, i in specials.items():
        if t in vd and vd[t] != i:
            raise ValueError(
                f"{caller}: added token {t!r} id {i} contradicts its "
                f"model.vocab id {vd[t]} — the file is corrupt"
            )
        other = by_id.get(i)
        if other is not None and other != t:
            raise ValueError(
                f"{caller}: added token {t!r} id {i} collides with "
                f"vocab token {other!r} — the id stream would be "
                "ambiguous"
            )


def _model_flag(model: dict, name: str, ok, caller: str) -> None:
    """Raise when a model flag carries a value the engine's replay
    cannot honor (``ok`` = the accepted values)."""
    v = model.get(name)
    if v not in ok:
        raise ValueError(
            f"{caller}: model.{name} = {v!r} is not supported — the "
            f"engine replay serves {ok!r} only"
        )


def _import_bpe(
    spark, obj: dict, model: dict, specials, oov_tokens_per_char,
    divergences: list, caller: str,
) -> TokenizerJsonModel:
    _model_flag(model, "dropout", (None,), caller)
    _model_flag(model, "unk_token", (None,), caller)
    _model_flag(model, "continuing_subword_prefix", (None, ""), caller)
    _model_flag(model, "end_of_word_suffix", (None, ""), caller)
    _model_flag(model, "byte_fallback", (None, False), caller)
    _model_flag(model, "ignore_merges", (None, False), caller)
    blocks = _flatten(
        _block(obj, "pre_tokenizer", caller), "pre_tokenizer", caller
    )
    types = [b["type"] for b in blocks]
    pre_chain = None
    if types == ["ByteLevel"]:
        bl = blocks[0]
        if bl.get("use_regex") is False:
            raise ValueError(
                f"{caller}: ByteLevel use_regex=false — the engine "
                "replays the GPT-2 pre-tokenizer regex; an "
                "unsplit byte stream is a different grain"
            )
        if bl.get("add_prefix_space") is True:
            raise ValueError(
                f"{caller}: ByteLevel add_prefix_space=true is not "
                "supported — the engine pre-tokenizes the text "
                "verbatim"
            )
        byte_level = True
    elif types in ([], ["WhitespaceSplit"]):
        byte_level = False
        if types == []:
            # published null means NO pre-split (the model sees the
            # whole text); the engine serves its whitespace grain —
            # a stated divergence, never a silent one (r15 review)
            divergences.append(
                "pre_tokenizer:null(whitespace-grain served)"
            )
    else:
        # the published word-grain blocks map onto the kernel
        # pre-tokenization hook (r16, closing the r15 VERDICT's
        # What's-missing #2): each member becomes a pattern or a
        # picklable splitter, a Sequence composes them successively
        # — exactly the library's member-wise re-split
        from wikiextractor_spark.functions.tokenizer import (
            split_digits_grouped,
            split_digits_individual,
            split_hf_whitespace,
            split_punctuation_isolated,
            split_whitespace_runs,
        )

        byte_level = False
        chain: list = []
        for b in blocks:
            t = b["type"]
            if t == "Whitespace":
                chain.append(split_hf_whitespace)
            elif t == "WhitespaceSplit":
                chain.append(split_whitespace_runs)
            elif t == "Punctuation":
                beh = b.get("behavior", "Isolated")
                if beh != "Isolated":
                    raise ValueError(
                        f"{caller}: Punctuation behavior {beh!r} is "
                        "not supported — the engine serves the "
                        "published 'Isolated' default only"
                    )
                chain.append(split_punctuation_isolated)
            elif t == "Digits":
                chain.append(
                    split_digits_individual
                    if b.get("individual_digits") is True
                    else split_digits_grouped
                )
            else:
                raise ValueError(
                    f"{caller}: unsupported BPE pre_tokenizer "
                    f"{types!r} — the engine serves ByteLevel "
                    "(GPT-2 grain), WhitespaceSplit/null (the "
                    "engine whitespace grain), and Whitespace / "
                    "Punctuation(Isolated) / Digits members "
                    "(alone or in a Sequence)"
                )
        pre_chain = tuple(chain) if len(chain) > 1 else chain[0]
    if _block(obj, "normalizer", caller) is not None:
        raise ValueError(
            f"{caller}: a BPE normalizer block is not supported — "
            "GPT-class artifacts carry none; normalize upstream"
        )
    vd = _vocab_dict(model, caller)
    _check_added_vs_vocab(vd, specials, caller)
    rows = [(t, float(i)) for t, i in vd.items()]
    rows.append((None, float(oov_tokens_per_char)))
    vocab = local_rows_df(spark, rows, VOCAB_SCHEMA)
    return TokenizerJsonModel(
        family="bpe", vocab=vocab,
        merges=_merge_pairs(model, caller),
        special_tokens=specials, byte_level=byte_level,
        bpe_pre_tokenizer=pre_chain,
        divergences=tuple(divergences),
    )


def _import_wordpiece(
    spark, obj: dict, model: dict, specials, divergences: list,
    caller: str,
) -> TokenizerJsonModel:
    from wikiextractor_spark.functions.wordpiece import (
        WORDPIECE_SCHEMA,
    )

    prefix = model.get("continuing_subword_prefix", "##")
    if prefix != "##":
        raise ValueError(
            f"{caller}: continuing_subword_prefix {prefix!r} — the "
            "engine WordPiece kernels serve the published '##' "
            "continuation grain only"
        )
    unk = model.get("unk_token")
    if not isinstance(unk, str) or unk == "":
        raise ValueError(
            f"{caller}: model.unk_token must be a non-empty string, "
            f"got {unk!r} — WordPiece cannot represent unknown "
            "words without it"
        )
    max_chars = model.get("max_input_chars_per_word", 100)
    if (
        isinstance(max_chars, bool)
        or not isinstance(max_chars, int)
        or max_chars < 1
    ):
        raise ValueError(
            f"{caller}: model.max_input_chars_per_word must be a "
            f"positive integer, got {max_chars!r}"
        )
    vd = _vocab_dict(model, caller)
    if unk not in vd:
        raise ValueError(
            f"{caller}: unk_token {unk!r} is not in model.vocab — "
            "fix the artifact"
        )
    _check_added_vs_vocab(vd, specials, caller)
    # grain: BertNormalizer and/or BertPreTokenizer → the
    # basic_tokenize_text chain; WhitespaceSplit/null → raw grain
    norm_blocks = _flatten(
        _block(obj, "normalizer", caller), "normalizer", caller
    )
    norm_types = [b["type"] for b in norm_blocks]
    pre_blocks = _flatten(
        _block(obj, "pre_tokenizer", caller), "pre_tokenizer", caller
    )
    pre_types = [b["type"] for b in pre_blocks]
    basic, lower, strip = False, True, True
    clean, cjk = False, False
    if norm_types == ["BertNormalizer"]:
        if pre_types not in (["BertPreTokenizer"], []):
            raise ValueError(
                f"{caller}: BertNormalizer with pre_tokenizer "
                f"{pre_types!r} — the engine's basic_tokenize grain "
                "pairs it with BertPreTokenizer (or null)"
            )
        b = norm_blocks[0]
        basic = True
        lower = b.get("lowercase", True) is not False
        sa = b.get("strip_accents")
        strip = lower if sa is None else sa is not False
        # clean_text / handle_chinese_chars SERVE faithfully (r16,
        # closing the r15 VERDICT's What's-missing #3 — they were
        # stated divergences): the published per-char control/format
        # removal and CJK spacing are now basic_tokenize_text steps
        clean = b.get("clean_text", True) is not False
        cjk = b.get("handle_chinese_chars", True) is not False
    elif norm_types == []:
        if pre_types == ["BertPreTokenizer"]:
            # the published cased-model config: punctuation split,
            # no case folding, no accent stripping
            basic, lower, strip = True, False, False
        elif pre_types not in ([], ["WhitespaceSplit"]):
            raise ValueError(
                f"{caller}: unsupported WordPiece pre_tokenizer "
                f"{pre_types!r} — the engine serves "
                "BertPreTokenizer, WhitespaceSplit, or null"
            )
    else:
        raise ValueError(
            f"{caller}: unsupported WordPiece normalizer "
            f"{norm_types!r} — the engine serves BertNormalizer or "
            "null"
        )
    if pre_types == []:
        # published null = no pre-split; state the grain that IS
        # served (r15 second review: the divergence print must not
        # claim a whitespace grain when the basic chain runs)
        divergences.append(
            "pre_tokenizer:null(%s-grain served)"
            % ("basic" if basic else "whitespace")
        )
    rows = [(t, float(i)) for t, i in vd.items()]
    vocab = local_rows_df(spark, rows, WORDPIECE_SCHEMA)
    return TokenizerJsonModel(
        family="wordpiece", vocab=vocab, special_tokens=specials,
        basic_tokenize=basic, lower=lower, strip_accents=strip,
        clean_text=clean, handle_chinese_chars=cjk,
        unk_token=unk, max_input_chars_per_word=max_chars,
        divergences=tuple(divergences),
    )


def _replace_content(b: dict):
    """A ``Replace`` normalizer's pattern/content — the pattern
    serializes as a string or a ``{"String": ...}`` tagged object."""
    p = b.get("pattern")
    if isinstance(p, dict):
        p = p.get("String")
    return p, b.get("content")


def _import_unigram(
    spark, obj: dict, model: dict, specials, unk_logprob,
    divergences: list, caller: str, charsmap: str = "record",
) -> TokenizerJsonModel:
    from wikiextractor_spark.functions.unigram import (
        UNIGRAM_SCHEMA,
        _check_marker,
        _check_marker_artifact,
    )

    _model_flag(model, "byte_fallback", (None, False, True), caller)
    entries = model.get("vocab")
    if not isinstance(entries, list) or not entries:
        raise ValueError(
            f"{caller}: model.vocab must be a non-empty list of "
            "[piece, score] pairs"
        )
    pieces: list[tuple[str, float]] = []
    for i, e in enumerate(entries):
        if (
            not isinstance(e, (list, tuple)) or len(e) != 2
            or not isinstance(e[0], str) or e[0] == ""
            or isinstance(e[1], bool)
            or not isinstance(e[1], (int, float))
            # json.loads parses Infinity/NaN literals — a corrupt
            # file must fail HERE with the entry in hand, not later
            # inside a serving kernel (r15 ADVICE)
            or not math.isfinite(e[1])
        ):
            raise ValueError(
                f"{caller}: malformed model.vocab entry {i}: {e!r} "
                "— need [non-empty string, finite numeric score]"
            )
        pieces.append((e[0], float(e[1])))
    if len({t for t, _s in pieces}) != len(pieces):
        raise ValueError(f"{caller}: duplicate model.vocab pieces")
    unk_id = model.get("unk_id")
    if unk_id is None:
        if unk_logprob is None:
            raise ValueError(
                f"{caller}: model.unk_id is null — pass "
                "unk_logprob= explicitly (the artifact carries no "
                "unk entry to derive it from)"
            )
        unk_text = None
    else:
        unk_id = _check_embedding_id(caller, "model.unk_id", unk_id)
        if unk_id >= len(pieces):
            raise ValueError(
                f"{caller}: model.unk_id {unk_id} is out of range "
                f"for a {len(pieces)}-entry vocab"
            )
        unk_text = pieces[unk_id][0]
    # byte_fallback (r16, the Llama/Mistral-class layout): accepted
    # IFF the vocab carries ALL 256 <0xNN> byte pieces (uppercase
    # hex, the published serialization) — the fallback must be able
    # to re-encode any UTF-8 byte; partial coverage refuses (the
    # raise-don't-guess policy).  Byte pieces stay MATCHABLE vocab
    # entries (the library trie contains them — a literal '<0x41>'
    # in text matches the piece), and their positions double as the
    # fallback byte→id map the serving kernels take.
    fb_ids = None
    if model.get("byte_fallback") is True:
        pos0 = {t: i for i, (t, _s) in enumerate(pieces)}
        fb_ids = {}
        missing = []
        for b in range(256):
            p = pos0.get(f"<0x{b:02X}>")
            if p is None:
                missing.append(b)
            else:
                fb_ids[b] = p
        if missing:
            raise ValueError(
                f"{caller}: model.byte_fallback is true but "
                f"{len(missing)} <0xNN> byte pieces are missing "
                f"(first: <0x{missing[0]:02X}>) — the fallback "
                "could not re-encode every UTF-8 byte"
            )
        bad_sp = [
            f"<0x{b:02X}>" for b in range(256)
            if f"<0x{b:02X}>" in (specials or ())
        ]
        if bad_sp:
            raise ValueError(
                f"{caller}: byte piece {bad_sp[0]!r} is also an "
                "added token — the fallback id would decode two ways"
            )
    # fail-fast collision policy at load (the _check_added_vs_vocab
    # discipline on the positional numbering): an added token that
    # is also a vocab piece must sit at ITS position, and an added
    # id must not collide with a different matchable piece's
    # position — the id stream would be ambiguous
    pos = {t: i for i, (t, _s) in enumerate(pieces)}
    for t, i in (specials or {}).items():
        if t in pos and pos[t] != i:
            raise ValueError(
                f"{caller}: added token {t!r} id {i} contradicts "
                f"its model.vocab position {pos[t]} — the file is "
                "corrupt"
            )
        if (
            t not in pos and i < len(pieces)
            and pieces[i][0] not in set(specials or ())
            and (unk_id is None or i != unk_id)
        ):
            raise ValueError(
                f"{caller}: added token {t!r} id {i} collides with "
                f"vocab piece {pieces[i][0]!r} — the id stream "
                "would be ambiguous"
            )
    # matchable pieces: everything except the unk entry and the
    # added-token texts (the overlay owns them — they serve through
    # the special-token pre-split, exactly the library's added
    # vocabulary precedence; a score-0 control piece like '<s>'
    # must never win a Viterbi segmentation as ordinary text)
    drop = set(specials or ())
    if unk_text is not None:
        drop.add(unk_text)
    toks = {t: s for t, s in pieces if t not in drop}
    token_ids = {
        t: i for i, (t, _s) in enumerate(pieces) if t in toks
    }
    if not toks:
        raise ValueError(
            f"{caller}: no matchable pieces — every model.vocab "
            "entry is the unk entry or an added token"
        )
    bad_ws = _bad_tokens(toks)
    if bad_ws:
        raise ValueError(
            f"{caller}: {len(bad_ws)} whitespace-carrying pieces "
            f"(first: {bad_ws[0]!r}) — they can never match under "
            "the engine's pre-tokenization"
        )
    if unk_logprob is not None and (
        isinstance(unk_logprob, bool)
        or not isinstance(unk_logprob, (int, float))
        or not math.isfinite(unk_logprob)
    ):
        raise ValueError(
            f"{caller}: unk_logprob override {unk_logprob!r} is not "
            "a finite number"
        )
    if unk_logprob is None:
        # the published rule: min vocab score minus kUnkPenalty —
        # NEVER the unk entry's stored score (typically 0.0, which
        # would dominate every real logprob).  The minimum ranges
        # over EVERY model.vocab score — including the unk entry and
        # added-token pieces — exactly the library's computation
        # (r16, the r15 ADVICE scope fix: it used to range over
        # matchable pieces only)
        unk_logprob = min(s for _t, s in pieces) - UNK_PENALTY
    # grain: Metaspace pre-tokenizer (T5-class) or the Prepend +
    # Replace normalizer pair (Llama-class) → space_marker mode
    marker = None
    pre_blocks = _flatten(
        _block(obj, "pre_tokenizer", caller), "pre_tokenizer", caller
    )
    pre_types = [b["type"] for b in pre_blocks]
    if pre_types == ["Metaspace"]:
        ms = pre_blocks[0]
        marker = ms.get("replacement", "▁")
        # the engine's marker kernel prefixes EVERY word — only the
        # 'always' scheme (and the legacy add_prefix_space=true
        # serialization of the same behavior) reproduces; 'first'/
        # 'never' change the very first word of every document
        scheme = ms.get("prepend_scheme")
        if scheme is None and ms.get("add_prefix_space") is False:
            scheme = "never"
        if scheme not in (None, "always"):
            raise ValueError(
                f"{caller}: Metaspace prepend_scheme={scheme!r} — "
                "the engine prefixes the marker on every word "
                "('always'); a 'first'/'never' file would tokenize "
                "every document's first word differently"
            )
        if ms.get("split") is False:
            # without the marker split, published pieces may span
            # word boundaries — the serving kernel's already-stated
            # marker-mode divergence; record it
            divergences.append("pre_tokenizer:Metaspace.split=false")
    elif pre_types == []:
        # published null = no pre-split (the Llama-class layout);
        # the engine serves its word grain — exactly the serving
        # kernels' stated marker-mode divergence, recorded here
        divergences.append(
            "pre_tokenizer:null(word-grain served)"
        )
    elif pre_types != ["WhitespaceSplit"]:
        raise ValueError(
            f"{caller}: unsupported Unigram pre_tokenizer "
            f"{pre_types!r} — the engine serves Metaspace, "
            "WhitespaceSplit, or null"
        )
    norm_blocks = _flatten(
        _block(obj, "normalizer", caller), "normalizer", caller
    )
    prepend, replace_to = None, None
    nfkc = False
    for b in norm_blocks:
        t = b["type"]
        if t == "Precompiled":
            # the SentencePiece charsmap.  The blob is an opaque
            # double-array trie the engine cannot decode, so the
            # CALLER states what it is: charsmap='nfkc' maps the
            # standard NFKC/nmt_nfkc charsmap onto the engine's
            # NFKC kernel (served per segment inside the kernel,
            # after the added-token split — the published order;
            # r16, closing the r15 VERDICT's What's-missing #5);
            # the 'record' default keeps the r15 stated divergence
            # (un-normalized serving).
            if charsmap == "nfkc":
                nfkc = True
            else:
                divergences.append("normalizer:Precompiled")
        elif t == "Prepend":
            prepend = b.get("prepend")
        elif t == "Replace":
            pat, content = _replace_content(b)
            if pat == " ":
                replace_to = content
            else:
                divergences.append(f"normalizer:Replace({pat!r})")
        else:
            raise ValueError(
                f"{caller}: unsupported Unigram normalizer block "
                f"{t!r}"
            )
    if prepend is not None or replace_to is not None:
        if prepend != replace_to:
            raise ValueError(
                f"{caller}: Prepend {prepend!r} / Replace-space "
                f"{replace_to!r} disagree — the engine's marker "
                "grain needs one marker"
            )
        if marker is not None and marker != prepend:
            raise ValueError(
                f"{caller}: Metaspace replacement {marker!r} and "
                f"normalizer marker {prepend!r} disagree"
            )
        marker = prepend
    if marker is not None:
        _check_marker(marker, caller)
        # a marker-grain file whose pieces are plain-grain is corrupt
        # — fail at load with the file in hand, not later in a kernel
        _check_marker_artifact(toks, marker, caller)
    rows = [(t, s) for t, s in toks.items()]
    rows.append((None, float(unk_logprob)))
    lm = local_rows_df(spark, rows, UNIGRAM_SCHEMA)
    return TokenizerJsonModel(
        family="unigram", lm=lm, token_ids=token_ids,
        special_tokens=specials, space_marker=marker,
        byte_fallback_ids=fb_ids, normalize_nfkc=nfkc,
        divergences=tuple(divergences),
    )


def _truncation_state(
    obj, divergences: list, caller: str,
) -> tuple | None:
    """The ``truncation`` block parsed to the served ``(strategy,
    max_length)`` state (r16).  The published strategies all serve;
    a malformed block raises; ``stride > 0`` (overflow windows) and
    ``direction: Left`` are not served — the block falls back WHOLE
    to a recorded divergence (the r15 behavior: full streams,
    stated), because honoring max_length while ignoring those
    options would silently emit a different stream than the file
    specifies."""
    tr = obj.get("truncation")
    if tr is None:
        return None
    if not isinstance(tr, dict):
        raise ValueError(
            f"{caller}: truncation must be null or an object, got "
            f"{tr!r}"
        )
    strategy = tr.get("strategy", "LongestFirst")
    if strategy not in ("LongestFirst", "OnlyFirst", "OnlySecond"):
        raise ValueError(
            f"{caller}: unknown truncation strategy {strategy!r}"
        )
    ml = tr.get("max_length")
    if isinstance(ml, bool) or not isinstance(ml, int) or ml < 1:
        raise ValueError(
            f"{caller}: truncation.max_length must be a positive "
            f"integer, got {ml!r}"
        )
    if tr.get("stride", 0) not in (0, None):
        divergences.append("truncation:stride")
        return None
    if tr.get("direction", "Right") not in ("Right", None):
        divergences.append("truncation:direction")
        return None
    return (strategy, ml)


def _decoder_divergences(
    obj, family: str, byte_level: bool, space_marker, caller: str,
    byte_fallback: bool = False,
) -> tuple[list[str], bool]:
    """The top-level ``decoder`` block inspected against what the
    engine's decode dispatch actually serves (r16, the r15 ADVICE
    finding — the block used to pass uninspected, so a file whose
    decode semantics the engine does not reproduce was served
    silently).  Blocks the dispatch reproduces pass clean: the
    ByteLevel decoder under byte-level BPE, the ``##``-prefix
    WordPiece decoder (``cleanup: true`` — the stock BERT layout —
    now SERVES faithfully via :func:`~wikiextractor_spark.functions.
    wordpiece.wordpiece_decode_ids` ``cleanup=True``), and the
    Metaspace decoder whose replacement matches the serving marker.
    A decoder the engine cannot reproduce is RECORDED as
    ``decoder:<type>``; a WordPiece prefix or Metaspace replacement
    CONTRADICTING the import's serving flags raises (the file is
    internally inconsistent with how its ids will decode).  Returns
    ``(divergences, wordpiece cleanup flag)``."""
    dec = obj.get("decoder")
    if dec is None:
        return [], False
    if not isinstance(dec, dict) or not isinstance(
        dec.get("type"), str
    ):
        raise ValueError(
            f"{caller}: decoder must be null or an object with a "
            f"string 'type', got {dec!r}"
        )
    t = dec["type"]
    if family == "bpe":
        if t == "ByteLevel" and byte_level:
            return [], False
        return [f"decoder:{t}"], False
    if family == "wordpiece":
        if t == "WordPiece":
            prefix = dec.get("prefix", "##")
            if prefix != "##":
                raise ValueError(
                    f"{caller}: WordPiece decoder prefix {prefix!r} "
                    "— the engine decode serves the published '##' "
                    "continuation grain only"
                )
            return [], dec.get("cleanup", True) is not False
        return [f"decoder:{t}"], False
    # unigram
    if t == "Sequence":
        # the Llama/Mistral-class published decoder chain: each
        # member the engine decode reproduces passes clean —
        # Replace(marker→' ') per piece, ByteFallback (served when
        # the model imported byte_fallback), Fuse (the engine's
        # concat), Strip one leading ' ' (the marker-mode rule);
        # anything else records member-wise
        members = dec.get("decoders")
        if not isinstance(members, list):
            raise ValueError(
                f"{caller}: decoder Sequence block carries no "
                "decoders list"
            )
        divs: list[str] = []
        for m in members:
            if not isinstance(m, dict) or not isinstance(
                m.get("type"), str
            ):
                raise ValueError(
                    f"{caller}: malformed decoder Sequence member "
                    f"{m!r}"
                )
            mt = m["type"]
            if mt == "Replace":
                pat, content = _replace_content(m)
                if (
                    space_marker is not None
                    and pat == space_marker and content == " "
                ):
                    continue
                divs.append(f"decoder:Replace({pat!r})")
            elif mt == "ByteFallback":
                if byte_fallback:
                    continue
                divs.append("decoder:ByteFallback")
            elif mt == "Fuse":
                continue
            elif mt == "Strip":
                if (
                    space_marker is not None
                    and m.get("content", " ") == " "
                    and m.get("start", 1) == 1
                    and m.get("stop", 0) == 0
                ):
                    continue
                divs.append("decoder:Strip")
            else:
                divs.append(f"decoder:{mt}")
        return divs, False
    if t == "ByteFallback" and byte_fallback:
        return [], False
    if t == "Metaspace" and space_marker is not None:
        if dec.get("replacement", "▁") != space_marker:
            raise ValueError(
                f"{caller}: Metaspace decoder replacement "
                f"{dec.get('replacement')!r} does not match the "
                f"serving marker {space_marker!r} — the file "
                "contradicts itself on how its ids decode"
            )
        scheme = dec.get("prepend_scheme")
        if scheme is None and dec.get("add_prefix_space") is False:
            scheme = "never"
        if scheme in (None, "always"):
            # marker→space + strip one leading space IS the engine's
            # marker-mode decode
            return [], False
        return [f"decoder:Metaspace.prepend_scheme={scheme}"], False
    return [f"decoder:{t}"], False


def load_tokenizer_json(
    spark, path: str, *,
    oov_tokens_per_char: float = 1.0,
    unk_logprob: float | None = None,
    charsmap: str = "record",
) -> TokenizerJsonModel:
    """Load a published single-file ``tokenizer.json`` as engine
    serving state — family detected from ``model.type``, component
    blocks mapped to kernel flags under the module-docstring policy
    (faithful → flag, unreproducible → raise, stated divergence →
    recorded).  ``oov_tokens_per_char`` is the BPE NULL-row scalar
    the format cannot express (the :func:`~wikiextractor_spark.
    functions.tokenizer.load_bpe_vocab_json` convention);
    ``unk_logprob`` overrides the Unigram published
    ``min - UNK_PENALTY`` unk rule (the :func:`~wikiextractor_spark.
    functions.unigram.load_unigram_lm` convention).  ``charsmap``
    (r16): what a SentencePiece ``Precompiled`` normalizer's opaque
    blob IS — ``'record'`` (default) keeps it a stated divergence;
    ``'nfkc'`` asserts the standard NFKC/nmt_nfkc charsmap and
    serves the engine's NFKC kernel per segment (the T5/Llama-class
    published normalization), removing the divergence."""
    caller = "load_tokenizer_json"
    if charsmap not in ("record", "nfkc"):
        raise ValueError(
            f"{caller}: charsmap must be 'record' or 'nfkc', got "
            f"{charsmap!r}"
        )
    text = _whole_text_artifact(spark, path, caller)
    try:
        obj = json.loads(text)
    except ValueError as exc:
        raise ValueError(
            f"{caller}: {path!r} is not valid JSON: {exc}"
        ) from exc
    if not isinstance(obj, dict):
        raise ValueError(
            f"{caller}: expected one JSON object, got "
            f"{type(obj).__name__}"
        )
    model = obj.get("model")
    if not isinstance(model, dict):
        raise ValueError(
            f"{caller}: no model block — not a tokenizer.json file"
        )
    fam = model.get("type")
    # the template upgrade (r15): BertProcessing / RobertaProcessing
    # / TemplateProcessing serve FAITHFULLY — single as prefix/suffix
    # ids, pair as encode-pairs elements; only unparseable pair
    # shapes and unknown types remain stated divergences
    tpre, tsuf, pair_els, divergences = _template_ids(obj, caller)
    specials = _added_tokens(obj, caller, divergences)
    # truncation SERVES (r16, closing the r15 VERDICT's
    # What's-missing #4): the three published strategies become
    # native array slices in the encode dispatches; only the
    # stride/direction options the engine cannot honor fall back to
    # the r15 recorded-divergence behavior.  The padding block stays
    # a stated divergence (the engine emits full-length streams —
    # apply pad_token_ids downstream).
    truncation = _truncation_state(obj, divergences, caller)
    if obj.get("padding") is not None:
        divergences.append("padding")
    if fam == "BPE":
        out = _import_bpe(
            spark, obj, model, specials, oov_tokens_per_char,
            divergences, caller,
        )
    elif fam == "WordPiece":
        out = _import_wordpiece(
            spark, obj, model, specials, divergences, caller
        )
    elif fam == "Unigram":
        out = _import_unigram(
            spark, obj, model, specials, unk_logprob, divergences,
            caller, charsmap=charsmap,
        )
    else:
        raise ValueError(
            f"{caller}: unsupported model.type {fam!r} — the engine "
            "serves BPE, WordPiece, and Unigram"
        )
    from dataclasses import replace

    # decoder inspected AFTER the family import fixed the serving
    # flags it must be checked against (r16)
    dec_divs, wp_cleanup = _decoder_divergences(
        obj, out.family, out.byte_level, out.space_marker, caller,
        byte_fallback=out.byte_fallback_ids is not None,
    )
    if dec_divs or wp_cleanup:
        out = replace(
            out,
            divergences=out.divergences + tuple(dec_divs),
            wp_decode_cleanup=wp_cleanup,
        )
    if tpre or tsuf or pair_els:
        out = replace(
            out, template_prefix=tpre, template_suffix=tsuf,
            pair_elements=pair_els,
        )
    if truncation is not None:
        out = replace(out, truncation=truncation)
    if charsmap == "nfkc" and not out.normalize_nfkc:
        # the caller asserted a charsmap the file does not carry —
        # discarding the assertion would serve un-normalized text
        # under an nfkc-claiming call (second review pass)
        raise ValueError(
            f"{caller}: charsmap='nfkc' asserts a SentencePiece "
            "Precompiled normalizer, but the file carries none — "
            "drop the option or fix the file"
        )
    return out


# --------------------------------------------------------------------------
# serving dispatch
# --------------------------------------------------------------------------

def _basic_grain(df: DataFrame, model: TokenizerJsonModel,
                 text_col: str, avoid: tuple = ()):
    """The WordPiece basic grain applied on an INTERNAL column so
    the caller's text column survives; returns (df, kernel text
    col, cleanup col).  ``avoid`` carries output column names the
    internal column must also dodge (an ``out_col='_tjn_basic'``
    would otherwise be dropped by the cleanup; r15 third review)."""
    from wikiextractor_spark.functions.wordpiece import (
        basic_tokenize_text,
    )

    if not model.basic_tokenize:
        return df, text_col, None
    tmp = "_tjn_basic"
    while tmp in df.columns or tmp in avoid:
        tmp += "_"  # never overwrite caller data or the output
    return (
        df.withColumn(
            tmp,
            basic_tokenize_text(
                text_col, lower=model.lower,
                do_strip_accents=model.strip_accents,
                clean_text=model.clean_text,
                handle_chinese_chars=model.handle_chinese_chars,
            ),
        ),
        tmp,
        tmp,
    )


def _with_template(
    df: DataFrame, model: TokenizerJsonModel, out_col: str,
) -> DataFrame:
    """The post_processor single-sequence template applied natively:
    prefix ids ++ body ++ suffix ids, one JVM array concat inside
    codegen (no kernel, no shuffle); NULL streams stay NULL."""
    if not (model.template_prefix or model.template_suffix):
        return df
    parts = []
    if model.template_prefix:
        parts.append(F.array(*[
            F.lit(i).cast("long") for i in model.template_prefix
        ]))
    parts.append(F.col(out_col))
    if model.template_suffix:
        parts.append(F.array(*[
            F.lit(i).cast("long") for i in model.template_suffix
        ]))
    return df.withColumn(
        out_col,
        F.when(F.col(out_col).isNotNull(), F.concat(*parts)),
    )


def tokenizer_json_token_ids(
    df: DataFrame, model: TokenizerJsonModel,
    text_col: str = "text", out_col: str = "token_ids",
    add_special_tokens: bool = True,
) -> DataFrame:
    """Attach ``out_col``: the text tokenized to an ``array<long>``
    of ids under the loaded file's FULL configuration — family
    kernel, grain flags, added-token overlay, and (r15) the
    post_processor single-sequence template — so one call serves
    whatever the file says (the ``AutoTokenizer`` shape).  Routes to
    :func:`~wikiextractor_spark.functions.tokenizer.bpe_token_ids` /
    :func:`~wikiextractor_spark.functions.wordpiece.
    wordpiece_token_ids` / :func:`~wikiextractor_spark.functions.
    unigram.unigram_token_ids` with the model's flags; unigram
    serves the PUBLISHED numbering (``token_ids`` = file positions)
    with ``oversize_word='chars'`` (crawl blobs degrade, never
    abort — the CLI serving default).  ``add_special_tokens``
    mirrors the published encode flag: True (default) wraps the
    body in the file's template ids (a native array concat);
    False emits the body only.  A loaded ``truncation`` block (r16)
    right-trims the body so the FULL output (template included when
    ``add_special_tokens``) fits ``max_length`` — the published
    pre-post-processing accounting, as one native ``slice``;
    ``OnlySecond`` raises here (a single encode has no second
    sequence — the published error)."""
    out = _tjn_body_ids(df, model, text_col, out_col)
    if model.truncation is not None:
        strategy, ml = model.truncation
        if strategy == "OnlySecond":
            raise ValueError(
                "tokenizer_json_token_ids: the loaded file truncates "
                "OnlySecond, but a single encode has no second "
                "sequence — use tokenizer_json_encode_pairs"
            )
        n_extra = (
            len(model.template_prefix) + len(model.template_suffix)
            if add_special_tokens else 0
        )
        budget = ml - n_extra
        if budget < 0:
            raise ValueError(
                f"tokenizer_json_token_ids: truncation max_length "
                f"{ml} cannot fit the file's {n_extra} template "
                "specials"
            )
        col = F.col(out_col)
        out = out.withColumn(
            out_col,
            F.when(col.isNotNull(), F.slice(col, 1, budget)),
        )
    return (
        _with_template(out, model, out_col)
        if add_special_tokens else out
    )


def _tjn_body_ids(
    df: DataFrame, model: TokenizerJsonModel,
    text_col: str, out_col: str,
) -> DataFrame:
    if model.family == "bpe":
        from wikiextractor_spark.functions.tokenizer import (
            GPT2_PRETOKENIZER_PATTERN,
            bpe_token_ids,
        )

        return bpe_token_ids(
            df, model.vocab, model.merges, text_col=text_col,
            out_col=out_col, byte_level=model.byte_level,
            pre_tokenizer=(
                GPT2_PRETOKENIZER_PATTERN if model.byte_level
                else model.bpe_pre_tokenizer
            ),
            special_tokens=model.special_tokens,
        )
    if model.family == "wordpiece":
        from wikiextractor_spark.functions.wordpiece import (
            wordpiece_token_ids,
        )

        if model.basic_tokenize and model.special_tokens:
            # the published order: added tokens split from the RAW
            # text, THEN each remaining segment normalizes — a
            # Column normalizer upstream would mangle the literal
            # special texts before the kernel's pre-split could see
            # them (r15 review), so the basic chain runs INSIDE the
            # kernel per segment via its Python twin
            from functools import partial

            from wikiextractor_spark.functions.wordpiece import (
                basic_tokenize_one,
            )

            return wordpiece_token_ids(
                df, model.vocab, text_col=text_col,
                out_col=out_col, unk_token=model.unk_token,
                max_input_chars_per_word=(
                    model.max_input_chars_per_word
                ),
                special_tokens=model.special_tokens,
                _segment_transform=partial(
                    basic_tokenize_one, lower=model.lower,
                    do_strip_accents=model.strip_accents,
                    clean_text=model.clean_text,
                    handle_chinese_chars=model.handle_chinese_chars,
                ),
            )
        d, col, tmp = _basic_grain(
            df, model, text_col, avoid=(out_col,)
        )
        out = wordpiece_token_ids(
            d, model.vocab, text_col=col, out_col=out_col,
            unk_token=model.unk_token,
            max_input_chars_per_word=model.max_input_chars_per_word,
            special_tokens=model.special_tokens,
        )
        return out.drop(tmp) if tmp else out
    from wikiextractor_spark.functions.unigram import (
        unigram_token_ids,
    )

    seg = None
    if model.normalize_nfkc:
        from functools import partial

        from wikiextractor_spark.functions.normalize import (
            _normalize_one,
        )

        # NFKC per segment INSIDE the kernel — after the added-token
        # split, the published normalizer order
        seg = partial(_normalize_one, form="NFKC")
    return unigram_token_ids(
        df, model.lm, text_col=text_col, out_col=out_col,
        token_ids=model.token_ids,
        special_tokens=model.special_tokens,
        oversize_word="chars", space_marker=model.space_marker,
        byte_fallback_ids=model.byte_fallback_ids,
        _segment_transform=seg,
    )


def tokenizer_json_decode_ids(
    df: DataFrame, model: TokenizerJsonModel,
    ids_col: str = "token_ids", out_col: str = "decoded",
) -> DataFrame:
    """Attach ``out_col``: the id stream DECODED back to text under
    the loaded file's configuration — the inverse dispatch of
    :func:`tokenizer_json_token_ids` (byte decode for ByteLevel BPE,
    the ``" ".join().replace(" ##", "")`` rule for WordPiece, the
    marker→space rewrite for marker-grain Unigram)."""
    if model.family == "bpe":
        from wikiextractor_spark.functions.tokenizer import (
            bpe_decode_ids,
        )

        return bpe_decode_ids(
            df, model.vocab, ids_col=ids_col, out_col=out_col,
            byte_level=model.byte_level,
            special_tokens=model.special_tokens,
        )
    if model.family == "wordpiece":
        from wikiextractor_spark.functions.wordpiece import (
            wordpiece_decode_ids,
        )

        return wordpiece_decode_ids(
            df, model.vocab, ids_col=ids_col, out_col=out_col,
            special_tokens=model.special_tokens,
            cleanup=model.wp_decode_cleanup,
        )
    from wikiextractor_spark.functions.unigram import (
        unigram_decode_ids,
    )

    return unigram_decode_ids(
        df, model.lm, ids_col=ids_col, out_col=out_col,
        token_ids=model.token_ids,
        special_tokens=model.special_tokens,
        space_marker=model.space_marker,
        byte_fallback_ids=model.byte_fallback_ids,
    )


def _truncate_pair_cols(
    d: DataFrame, model: TokenizerJsonModel,
    col_a: str, col_b: str,
) -> DataFrame:
    """The loaded ``truncation`` block applied to the two body
    streams BEFORE template assembly (r16) — the published
    ``truncate_encodings``: budget = max_length minus the pair
    template's special count; under ``LongestFirst`` tokens trim one
    at a time from whichever sequence is currently longer (ties trim
    the second), whose closed form is ``ka = min(la, max(⌈b/2⌉,
    b − lb))``, ``kb = b − ka``; ``OnlyFirst``/``OnlySecond`` trim
    one sequence only and RAISE when the other alone exceeds the
    budget (the published error), surfaced per row through a
    ``raise_error`` branch.  All native ``slice``/``when`` — no
    kernel, no shuffle."""
    strategy, ml = model.truncation
    n_special = sum(
        1 for kind, _i, _t in model.pair_elements if kind == "special"
    )
    budget = ml - n_special
    if budget < 0:
        raise ValueError(
            f"tokenizer_json_encode_pairs: truncation max_length "
            f"{ml} cannot fit the pair template's {n_special} "
            "specials"
        )
    la, lb = F.size(F.col(col_a)), F.size(F.col(col_b))
    b = F.lit(budget)
    over = (la + lb) > b
    if strategy == "LongestFirst":
        half = (budget + 1) // 2
        ka = F.least(la, F.greatest(F.lit(half), b - lb))
        kb = b - ka
    elif strategy == "OnlyFirst":
        ka = F.when(
            lb > b,
            F.raise_error(F.lit(
                "tokenizer_json_encode_pairs: OnlyFirst truncation "
                "cannot fit — the second sequence alone exceeds the "
                "budget"
            )).cast("int"),
        ).otherwise(b - lb)
        kb = lb
    else:  # OnlySecond
        ka = la
        kb = F.when(
            la > b,
            F.raise_error(F.lit(
                "tokenizer_json_encode_pairs: OnlySecond truncation "
                "cannot fit — the first sequence alone exceeds the "
                "budget"
            )).cast("int"),
        ).otherwise(b - la)
    # ONE withColumns: both expressions must see the ORIGINAL
    # columns — chaining withColumn would feed col_b's size math the
    # already-truncated col_a
    return d.withColumns({
        col_a: F.when(over, F.slice(F.col(col_a), 1, ka))
        .otherwise(F.col(col_a)),
        col_b: F.when(over, F.slice(F.col(col_b), 1, kb))
        .otherwise(F.col(col_b)),
    })


def tokenizer_json_encode_pairs(
    df: DataFrame, model: TokenizerJsonModel,
    text_a_col: str = "text_a", text_b_col: str = "text_b",
    out_col: str = "input_ids", type_col: str = "token_type_ids",
) -> DataFrame:
    """Attach ``out_col`` + ``type_col``: TWO text columns encoded
    as one sequence under the loaded file's PAIR template (r15) —
    the published two-segment encode (BERT NSP-style ``[CLS] A
    [SEP] B [SEP]`` with ``token_type_ids`` 0/1, RoBERTa's
    double-``</s>`` layout, or whatever element order the file's
    ``TemplateProcessing.pair`` states).  Each segment tokenizes
    through the family kernel exactly like
    :func:`tokenizer_json_token_ids`; the template assembly and the
    type-id stream are pure native array concat /
    ``array_repeat`` — no extra kernel, no shuffle.  A row where
    EITHER text is NULL yields NULL in both outputs.  Raises when
    the file carries no servable pair template (check
    ``model.pair_elements``)."""
    if not model.pair_elements:
        raise ValueError(
            "tokenizer_json_encode_pairs: the loaded file carries "
            "no servable pair template — nothing states how two "
            "segments compose; use tokenizer_json_token_ids, or "
            "load a file with a TemplateProcessing pair block"
        )
    # internal columns uniquified against the caller's frame — a
    # fixed name would silently overwrite-then-drop user data (r15
    # second review)
    def _tmp(base: str) -> str:
        name = base
        while name in df.columns or name in (out_col, type_col):
            name += "_"
        return name

    col_a, col_b = _tmp("_tjn_a"), _tmp("_tjn_b")
    d = _tjn_body_ids(df, model, text_a_col, col_a)
    d = _tjn_body_ids(d, model, text_b_col, col_b)
    if model.truncation is not None:
        d = _truncate_pair_cols(d, model, col_a, col_b)
    id_parts = []
    ty_parts = []
    for kind, sid, ty in model.pair_elements:
        if kind == "special":
            id_parts.append(F.array(F.lit(sid).cast("long")))
            ty_parts.append(F.array(F.lit(ty).cast("long")))
        else:
            col = F.col(col_a if kind == "A" else col_b)
            id_parts.append(col)
            ty_parts.append(
                F.array_repeat(F.lit(ty).cast("long"), F.size(col))
            )
    both = F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    return (
        d.withColumn(out_col, F.when(both, F.concat(*id_parts)))
        .withColumn(type_col, F.when(both, F.concat(*ty_parts)))
        .drop(col_a, col_b)
    )


def pad_token_ids(
    df: DataFrame, ids_col: str = "token_ids",
    max_len: int = 512, pad_id: int = 0,
    *, out_col: str | None = None,
    mask_col: str = "attention_mask",
) -> DataFrame:
    """Attach a FIXED-LENGTH view of an id stream — right-truncate
    to ``max_len``, right-pad with ``pad_id``, and emit the matching
    ``attention_mask`` (1 over real tokens, 0 over padding) — the
    published truncation/padding step as pure native ``slice`` /
    ``array_repeat`` / ``concat`` (no kernel, no shuffle), for
    fixed-shape training batches where
    :func:`~wikiextractor_spark.operators.packing.assemble_packs`'
    variable packing is not the target layout.  ``out_col`` defaults
    to rewriting ``ids_col`` in place; NULL streams stay NULL in
    both outputs."""
    if not isinstance(max_len, int) or isinstance(max_len, bool) \
            or max_len < 1:
        raise ValueError(
            f"pad_token_ids: max_len must be a positive integer, "
            f"got {max_len!r}"
        )
    pad = _check_embedding_id("pad_token_ids", "pad_id", pad_id)
    out_col = out_col or ids_col
    ids = F.col(ids_col)
    n = F.least(F.size(ids), F.lit(max_len))
    fill = F.lit(max_len) - n
    padded = F.concat(
        F.slice(ids, 1, max_len),
        F.array_repeat(F.lit(pad).cast("long"), fill),
    )
    mask = F.concat(
        F.array_repeat(F.lit(1).cast("long"), n),
        F.array_repeat(F.lit(0).cast("long"), fill),
    )
    return df.withColumn(
        mask_col, F.when(ids.isNotNull(), mask)
    ).withColumn(out_col, F.when(ids.isNotNull(), padded))


# --------------------------------------------------------------------------
# export
# --------------------------------------------------------------------------

def _added_entries(sids: dict[str, int] | None) -> list[dict]:
    """``added_tokens`` entries from the kernels' ``{text: id}``
    mapping — the library's field set, ``special: true`` (the
    engine's specials are reserved markers, never normalized)."""
    return [
        {
            "id": i, "content": t, "single_word": False,
            "lstrip": False, "rstrip": False, "normalized": False,
            "special": True,
        }
        for t, i in sorted(
            (sids or {}).items(), key=lambda kv: kv[1]
        )
    ]


def _template_block(
    template, pair_template, sids: dict[str, int] | None,
    caller: str,
):
    """The export-side inverse of :func:`_template_ids`'s
    TemplateProcessing parse: ``template = (prefix texts, suffix
    texts)`` for the single-sequence layout, ``pair_template`` in
    the :class:`TokenizerJsonModel` ``pair_elements`` shape
    (``('special', id, type_id)`` / ``('A'|'B', None, type_id)``) —
    so a loaded model's pair template re-exports instead of being
    silently dropped (r15 second review).  Every special must be
    DECLARED (text for the single form, id for the pair form — the
    added_tokens ids are what the template resolves to, so import
    and serving agree by construction)."""
    if template is None and pair_template is None:
        return None
    used: dict[str, int] = {}

    def sp_el(text: str, ty: int):
        used[text] = sids[text]
        return {"SpecialToken": {"id": text, "type_id": ty}}

    if template is not None:
        if (
            not isinstance(template, (list, tuple))
            or len(template) != 2
            or not all(isinstance(p, (list, tuple)) for p in template)
        ):
            raise ValueError(
                f"{caller}: template must be (prefix texts, suffix "
                f"texts), got {template!r}"
            )
        # elements may be special TEXTS or declared special IDS —
        # the latter so a LOADED model's template_prefix/suffix id
        # tuples re-export without the caller hand-inverting the
        # specials mapping (r15 third review)
        rev_ids = {i: t for t, i in (sids or {}).items()}

        def as_text(e):
            if isinstance(e, str):
                return e
            i = _check_embedding_id(caller, "template element", e)
            t = rev_ids.get(i)
            if t is None:
                raise ValueError(
                    f"{caller}: template id {i} is not a declared "
                    "special token — the template could not name it"
                )
            return t

        pre, suf = ([as_text(e) for e in p] for p in template)
        texts = pre + suf
        if not texts:
            raise ValueError(
                f"{caller}: an empty template expresses nothing — "
                "pass template=None"
            )
        missing = [t for t in texts if t not in (sids or {})]
        if missing:
            raise ValueError(
                f"{caller}: template text {missing[0]!r} is not a "
                "declared special token — the template could not "
                "resolve its id"
            )
        single = (
            [sp_el(t, 0) for t in pre]
            + [{"Sequence": {"id": "A", "type_id": 0}}]
            + [sp_el(t, 0) for t in suf]
        )
    else:
        # pair-only export: the bare single template (no specials
        # around the body) is the valid minimal form
        single = [{"Sequence": {"id": "A", "type_id": 0}}]
    pair = None
    if pair_template is not None:
        rev = {i: t for t, i in (sids or {}).items()}
        pair = []
        seen: set[str] = set()
        for el in pair_template:
            if not isinstance(el, (list, tuple)) or len(el) != 3:
                raise ValueError(
                    f"{caller}: malformed pair_template element "
                    f"{el!r} — need ('special', id, type_id) or "
                    "('A'|'B', None, type_id)"
                )
            kind, sid, ty = el
            ty = _check_type_id(ty, f"pair element {kind!r}", caller)
            if kind in ("A", "B"):
                if sid is not None:
                    # a non-None middle value looks like it binds
                    # the sequence to an id — it binds nothing, so
                    # silently discarding it would mislead (r15
                    # third review)
                    raise ValueError(
                        f"{caller}: pair_template sequence {kind} "
                        f"carries id {sid!r} — sequences take no "
                        "id; pass ('A'|'B', None, type_id)"
                    )
                if kind in seen:
                    raise ValueError(
                        f"{caller}: pair_template references "
                        f"sequence {kind} twice"
                    )
                seen.add(kind)
                pair.append(
                    {"Sequence": {"id": kind, "type_id": ty}}
                )
            elif kind == "special":
                i = _check_embedding_id(
                    caller, "pair special", sid
                )
                text = rev.get(i)
                if text is None:
                    raise ValueError(
                        f"{caller}: pair special id {i} is not a "
                        "declared special token — the template "
                        "could not name it"
                    )
                pair.append(sp_el(text, ty))
            else:
                raise ValueError(
                    f"{caller}: unknown pair_template element kind "
                    f"{kind!r}"
                )
        if seen != {"A", "B"}:
            raise ValueError(
                f"{caller}: pair_template must reference sequences "
                "A and B exactly once each"
            )
    return {
        "type": "TemplateProcessing",
        "single": single,
        "pair": pair,
        "special_tokens": {
            t: {"id": t, "ids": [i], "tokens": [t]}
            for t, i in used.items()
        },
    }


def _emit(spark, path: str, *, model: dict, normalizer, pre_tokenizer,
          decoder, added: list[dict], post_processor=None) -> None:
    obj = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": added,
        "normalizer": normalizer,
        "pre_tokenizer": pre_tokenizer,
        "post_processor": post_processor,
        "decoder": decoder,
        "model": model,
    }
    from wikiextractor_spark.functions.modelio import (
        write_one_text_file,
    )

    write_one_text_file(
        spark,
        json.dumps(obj, ensure_ascii=False, separators=(",", ":")),
        path,
    )


_BYTELEVEL_BLOCK = {
    "type": "ByteLevel", "add_prefix_space": False,
    "trim_offsets": True, "use_regex": True,
}


def save_tokenizer_json_bpe(
    spark, vocab: DataFrame, merges: dict, path: str, *,
    byte_level: bool = False,
    special_tokens: dict[str, int] | None = None,
    template: tuple | None = None,
    pair_template: tuple | None = None,
) -> None:
    """Export a BPE artifact pair as a single ``tokenizer.json`` —
    model.vocab in id order, model.merges as ``"left right"``
    strings in rank order (both accepted serializations reimport),
    specials as ``added_tokens`` (a special whose text is also a
    vocab entry must agree on the id — the published
    special-in-vocab layout; one that is not stays an overlay).
    ``byte_level`` writes the ByteLevel pre-tokenizer/decoder
    blocks (the GPT-2 layout); otherwise WhitespaceSplit (the
    engine's whitespace grain, stated).  The NULL-row OOV scalar is
    not expressible — pass ``oov_tokens_per_char=`` on reimport.
    Validation is the per-format exporters' (duplicate texts,
    non-integral ids, whitespace-carrying merge sides raise);
    round trip pinned by pytest."""
    from wikiextractor_spark.functions.tokenizer import (
        _compile_specials,
        _ordered_merge_pairs,
        _vocab_tokens_and_oov,
    )

    caller = "save_tokenizer_json_bpe"
    _tokens, _oov, rows = _vocab_tokens_and_oov(vocab, caller)
    _sp, sids = _compile_specials(special_tokens, caller)
    _tok2id, id2tok, _rev = _vocab_id_maps(rows, sids, caller)
    if len(set(id2tok.values())) != len(id2tok):
        raise ValueError(
            f"{caller}: duplicate token texts — the JSON object "
            "would silently drop ids; fix the artifact"
        )
    pairs = _ordered_merge_pairs(merges, caller)
    _emit(
        spark, path,
        model={
            "type": "BPE",
            "dropout": None,
            "unk_token": None,
            "continuing_subword_prefix": "",
            "end_of_word_suffix": "",
            "fuse_unk": False,
            "byte_fallback": False,
            "ignore_merges": False,
            "vocab": {id2tok[i]: i for i in sorted(id2tok)},
            "merges": [f"{a} {b}" for a, b in pairs],
        },
        normalizer=None,
        pre_tokenizer=(
            dict(_BYTELEVEL_BLOCK) if byte_level
            else {"type": "WhitespaceSplit"}
        ),
        decoder=dict(_BYTELEVEL_BLOCK) if byte_level else None,
        added=_added_entries(sids),
        post_processor=_template_block(
            template, pair_template, sids, caller
        ),
    )


def save_tokenizer_json_wordpiece(
    spark, vocab: DataFrame, path: str, *,
    unk_token: str = "[UNK]",
    max_input_chars_per_word: int = 100,
    basic_tokenize: bool = False, lower: bool = True,
    strip_accents: bool | None = None,
    clean_text: bool = True, handle_chinese_chars: bool = True,
    special_tokens: dict[str, int] | None = None,
    template: tuple | None = None,
    pair_template: tuple | None = None,
) -> None:
    """Export a WordPiece vocabulary as a single ``tokenizer.json``
    — ``unk_token`` must be a vocabulary entry (the serving rule);
    ``basic_tokenize`` writes the BertNormalizer/BertPreTokenizer
    pair with the engine grain's flags — since r16 ``clean_text``
    and ``handle_chinese_chars`` SERVE faithfully (the published
    per-char control/format removal and CJK spacing are
    :func:`~wikiextractor_spark.functions.wordpiece.
    basic_tokenize_text` steps, defaulting on like the published
    class), so the stock-BERT block round-trips — otherwise
    WhitespaceSplit.  ``strip_accents`` None follows ``lower`` (the
    published tie)."""
    from wikiextractor_spark.functions.tokenizer import (
        _compile_specials,
    )
    from wikiextractor_spark.functions.wordpiece import (
        _check_tokens_shape,
    )

    caller = "save_tokenizer_json_wordpiece"
    rows = vocab.select("token", "token_id").collect()
    toks = [r["token"] for r in rows]
    if any(t is None for t in toks):
        raise ValueError(
            f"{caller}: NULL token row — WordPiece vocabularies "
            "carry no scalar row; fix the artifact"
        )
    _check_tokens_shape(toks, caller)
    _sp, sids = _compile_specials(special_tokens, caller)
    _tok2id, id2tok, _rev = _vocab_id_maps(rows, sids, caller)
    if unk_token not in _tok2id:
        raise ValueError(
            f"{caller}: unk_token {unk_token!r} is not in the "
            "vocabulary — WordPiece cannot represent unknown words "
            "without it"
        )
    if (
        isinstance(max_input_chars_per_word, bool)
        or not isinstance(max_input_chars_per_word, int)
        or max_input_chars_per_word < 1
    ):
        raise ValueError(
            f"{caller}: max_input_chars_per_word must be a positive "
            f"integer, got {max_input_chars_per_word!r}"
        )
    strip = lower if strip_accents is None else strip_accents
    _emit(
        spark, path,
        model={
            "type": "WordPiece",
            "unk_token": unk_token,
            "continuing_subword_prefix": "##",
            "max_input_chars_per_word": max_input_chars_per_word,
            "vocab": {id2tok[i]: i for i in sorted(id2tok)},
        },
        normalizer=(
            {
                "type": "BertNormalizer",
                "clean_text": bool(clean_text),
                "handle_chinese_chars": bool(handle_chinese_chars),
                "strip_accents": strip,
                "lowercase": lower,
            }
            if basic_tokenize else None
        ),
        pre_tokenizer=(
            {"type": "BertPreTokenizer"} if basic_tokenize
            else {"type": "WhitespaceSplit"}
        ),
        decoder={"type": "WordPiece", "prefix": "##",
                 "cleanup": False},
        added=_added_entries(sids),
        post_processor=_template_block(
            template, pair_template, sids, caller
        ),
    )


def _unigram_decoder_block(space_marker, byte_fallback: bool):
    """The exported unigram decoder, matching what the engine decode
    actually does so reimport accepts it clean: the Metaspace block
    in plain marker mode; under ``byte_fallback`` the published
    Llama-shape Sequence chain (Replace marker→space per piece,
    ByteFallback, Fuse, Strip one leading space) or the markerless
    [ByteFallback, Fuse] pair; None when neither applies."""
    if byte_fallback:
        members: list[dict] = []
        if space_marker is not None:
            members.append({
                "type": "Replace",
                "pattern": {"String": space_marker},
                "content": " ",
            })
        members += [
            {"type": "ByteFallback"},
            {"type": "Fuse"},
        ]
        if space_marker is not None:
            members.append({
                "type": "Strip", "content": " ",
                "start": 1, "stop": 0,
            })
        return {"type": "Sequence", "decoders": members}
    if space_marker is not None:
        return {
            "type": "Metaspace",
            "replacement": space_marker,
            "prepend_scheme": "always",
            "split": True,
        }
    return None


def save_tokenizer_json_unigram(
    spark, lm: DataFrame, path: str, *,
    unk_token: str = "<unk>",
    space_marker: str | None = None,
    special_tokens: dict[str, int] | None = None,
    template: tuple | None = None,
    pair_template: tuple | None = None,
    byte_fallback: bool = False,
) -> None:
    """Export a unigram LM as a single ``tokenizer.json`` — the
    SentencePiece layout: the unk entry at position 0 with score
    ``0.0`` (the engine's per-character unk scalar is not
    expressible; reimport applies the published ``min -
    UNK_PENALTY`` rule or an explicit override, stated), then the
    pieces most-probable-first (the ``.vocab`` TSV order) at
    positions ``1..n`` — which reimport returns as the published
    ``token_ids`` numbering.  ``space_marker`` writes the Metaspace
    pre-tokenizer block (serve with the same marker; the artifact
    must carry marker-grain pieces).  Special ids must sit OUTSIDE
    ``0..n`` (the piece numbering — a collision would make the id
    stream ambiguous, the serve-side rule)."""
    from wikiextractor_spark.functions.tokenizer import (
        _compile_specials,
    )
    from wikiextractor_spark.functions.unigram import (
        _check_marker,
        _check_marker_artifact,
        _lm_tokens_and_unk,
    )

    caller = "save_tokenizer_json_unigram"
    toks, _unk = _lm_tokens_and_unk(lm, caller)
    if not isinstance(unk_token, str) or unk_token == "":
        raise ValueError(
            f"{caller}: unk_token must be a non-empty string, got "
            f"{unk_token!r}"
        )
    if unk_token in toks:
        raise ValueError(
            f"{caller}: unk_token {unk_token!r} is also a piece — "
            "the unk entry would be ambiguous; pick another text"
        )
    if space_marker is not None:
        marker = _check_marker(space_marker, caller)
        _check_marker_artifact(toks, marker, caller)
    if byte_fallback:
        # the flag is only honest when the written vocab can
        # actually re-encode every byte — the import-side rule,
        # enforced with the export in hand (r16)
        missing = [
            b for b in range(256) if f"<0x{b:02X}>" not in toks
        ]
        if missing:
            raise ValueError(
                f"{caller}: byte_fallback=True but {len(missing)} "
                f"<0xNN> byte pieces are missing from the LM "
                f"(first: <0x{missing[0]:02X}>) — add them or drop "
                "the flag"
            )
    _sp, sids = _compile_specials(special_tokens, caller)
    n_entries = len(toks) + 1
    collide = [
        (t, i) for t, i in (sids or {}).items() if i < n_entries
    ]
    if collide:
        raise ValueError(
            f"{caller}: special token {collide[0][0]!r} id "
            f"{collide[0][1]} collides with the piece numbering "
            f"0..{n_entries - 1} — reserve specials beyond the "
            "table"
        )
    # TEXT collisions write a file the importer rejects as corrupt
    # (an added token that is also a vocab entry must sit at ITS
    # position — but these specials ride beyond the table): refuse
    # here, with the export in hand (r15 review)
    bad_text = [
        t for t in (sids or {}) if t == unk_token or t in toks
    ]
    if bad_text:
        raise ValueError(
            f"{caller}: special token text {bad_text[0]!r} is also "
            f"{'the unk entry' if bad_text[0] == unk_token else 'a piece'}"
            " — the written file would contradict itself on the "
            "text's id; rename the special or the unk_token"
        )
    ordered = sorted(toks.items(), key=lambda kv: (-kv[1], kv[0]))
    _emit(
        spark, path,
        model={
            "type": "Unigram",
            "unk_id": 0,
            "vocab": [[unk_token, 0.0]]
            + [[t, s] for t, s in ordered],
            "byte_fallback": bool(byte_fallback),
        },
        normalizer=None,
        pre_tokenizer=(
            {
                "type": "Metaspace",
                "replacement": space_marker,
                "prepend_scheme": "always",
                "split": True,
            }
            if space_marker is not None
            else {"type": "WhitespaceSplit"}
        ),
        decoder=_unigram_decoder_block(space_marker, byte_fallback),
        added=_added_entries(sids),
        post_processor=_template_block(
            template, pair_template, sids, caller
        ),
    )
