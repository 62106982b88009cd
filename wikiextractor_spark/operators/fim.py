"""Fill-in-the-middle (FIM) transformation over tokenized id streams
— the document-level data augmentation code-model pretraining uses
(Bavarian et al. 2022, "Efficient Training of Language Models to Fill
in the Middle"): for a fraction of documents, split the id stream
into (prefix, middle, suffix) at two positions and rearrange with
sentinel tokens so the model learns to infill,

    PSM:  [PRE] prefix [SUF] suffix [MID] middle
    SPM:  [PRE] [SUF] suffix [MID] prefix middle

(the published PSM and joined-SPM orderings; the paper trains on a
mix).  The rest of the corpus passes through untouched.

Everything is DETERMINISTIC and engine-reproducible — the gate and
both cut positions are md5-derived pure functions of (doc id, salt),
the same construction as the engine's deterministic samplers, so a
re-run on any cluster layout produces byte-identical streams and a
DuckDB oracle can restate the whole transform:

* gate: ``md5(id || salt)`` bucket < rate · 1e6 (exactly
  :func:`~wikiextractor_spark.operators.sampling.deterministic_sample`'s
  gate);
* cuts: two FULL-WIDTH salted 60-bit draws mod (n + 1), sorted
  (r13 — the 1e6-bucket draw confined both cuts to the first million
  positions on longer streams and carried ~n/1e6 modulo bias; the
  60-bit draw's bias is ~n/2^60, negligible at any real document
  length) — every (c1 <= c2) split of an n-token stream is
  reachable, including empty prefix/middle/suffix (the paper keeps
  them; an empty middle teaches "nothing to fill").

Scale shape: one narrow native projection — ``slice`` + ``concat``
under the one-element-array idiom, zero Python, zero shuffle, zero
joins — so it composes into the emit pipeline between
:func:`~wikiextractor_spark.functions.tokenizer.bpe_token_ids` and
:func:`~wikiextractor_spark.operators.packing.assemble_packs` /
:func:`~wikiextractor_spark.operators.chunking.chunk_token_ids` at
scan speed.

Sentinel ids are the caller's contract (real tokenizers reserve
them, e.g. the published suffix/prefix/middle specials); they must
be non-negative and SHOULD be outside the vocabulary's id range —
the engine cannot check the latter against a merges-only artifact,
so it validates non-negativity (the -1 OOV sentinel stays
unambiguous) and distinctness.

Two grains (r13): :func:`fim_transform` rearranges TOKENIZED id
streams (cuts at token boundaries); :func:`fim_transform_text`
rearranges the raw TEXT at character positions with literal marker
strings — the paper's recommended application — and composes with
``bpe_token_ids(special_tokens=...)`` so the markers emit reserved
ids.

No reference counterpart — engine extension (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wikiextractor_spark.operators.sampling import (
    _BUCKETS,
    _hash_bucket,
    _hash_u60,
)


def _gate_and_cuts(id_col: str, salt: str, fim_rate: float, n):
    """The ONE home of the FIM determinism derivation, shared by both
    grains (r13 review — the r12 bucket→u60 cut fix had to land in
    one place; a future change must too): the md5-bucket gate and two
    independent full-width draws mod (n + 1), sorted.  Each cut is
    (near-)uniform over [0, n] (60-bit draw → modulo bias ~n/2^60);
    the SORTED pair is NOT uniform over {c1 <= c2} — diagonal pairs
    (c1 == c2) carry half the mass of off-diagonal ones, the standard
    order-statistics shape of two independent draws.  ``n`` is the
    grain's length expression (token count or character count)."""
    if not 0.0 <= fim_rate <= 1.0:
        raise ValueError(f"fim_rate must be in [0, 1], got {fim_rate}")
    gate = _hash_bucket(F.col(id_col), salt) < int(
        round(fim_rate * _BUCKETS)
    )
    h1 = _hash_u60(F.col(id_col), salt + ":c1") % (n + 1)
    h2 = _hash_u60(F.col(id_col), salt + ":c2") % (n + 1)
    return gate, F.least(h1, h2), F.greatest(h1, h2)


def fim_transform(
    df: DataFrame, ids_col: str = "token_ids", id_col: str = "doc_id",
    *, prefix_id: int, middle_id: int, suffix_id: int,
    fim_rate: float = 0.5, spm: bool = False, salt: str = "fim",
) -> DataFrame:
    """Rewrite ``ids_col`` in place: a deterministic ``fim_rate``
    fraction of documents (md5 gate on ``id_col``) becomes the FIM
    arrangement with the given sentinel ids; the rest pass through
    byte-identical.  ``spm=False`` emits PSM, ``True`` the joined SPM
    ordering.  NULL streams stay NULL (the transform neither drops
    nor invents rows — gate NULL-text upstream as everywhere else).

    Sentinels: three DISTINCT non-negative longs.  Transformed
    streams grow by exactly 3 tokens — budget ``assemble_packs`` /
    ``chunk_token_ids`` accordingly."""
    sent = {"prefix_id": prefix_id, "middle_id": middle_id,
            "suffix_id": suffix_id}
    for name, v in sent.items():
        if int(v) < 0:
            raise ValueError(
                f"fim_transform: {name}={v} is negative — it would "
                "collide with the -1 OOV sentinel"
            )
    if len({int(v) for v in sent.values()}) != 3:
        raise ValueError(
            f"fim_transform: sentinel ids must be distinct, got {sent}"
        )
    n = F.size(F.col(ids_col))
    gate, c1, c2 = _gate_and_cuts(id_col, salt, fim_rate, n)

    def lit1(v: int):
        return F.array(F.lit(int(v)).cast("long"))

    # slice(ids, start, length) is 1-based; empty slices are legal
    prefix = F.slice(F.col(ids_col), F.lit(1), c1)
    middle = F.slice(F.col(ids_col), c1 + 1, c2 - c1)
    suffix = F.slice(F.col(ids_col), c2 + 1, n - c2)
    psm = F.concat(
        lit1(prefix_id), prefix, lit1(suffix_id), suffix,
        lit1(middle_id), middle,
    )
    spm_arr = F.concat(
        lit1(prefix_id), lit1(suffix_id), suffix,
        lit1(middle_id), prefix, middle,
    )
    arranged = spm_arr if spm else psm
    return df.withColumn(
        ids_col,
        F.when(F.col(ids_col).isNull(), F.col(ids_col))
        .when(gate, arranged)
        .otherwise(F.col(ids_col)),
    )


def fim_transform_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    *, prefix_tok: str = "<|fim_prefix|>",
    middle_tok: str = "<|fim_middle|>",
    suffix_tok: str = "<|fim_suffix|>",
    fim_rate: float = 0.5, spm: bool = False, salt: str = "fimc",
) -> DataFrame:
    """CHARACTER-grain FIM (r13): rewrite ``text_col`` in place — a
    deterministic ``fim_rate`` fraction of documents is split at two
    character positions and rearranged with literal sentinel MARKER
    strings,

        PSM:  <|fim_prefix|> prefix <|fim_suffix|> suffix
              <|fim_middle|> middle      (no spaces inserted)

    the paper's recommended character-level application (Bavarian et
    al. 2022 §4: splitting in raw text avoids constraining the cuts
    to token boundaries).  The output composes with
    :func:`~wikiextractor_spark.functions.tokenizer.bpe_token_ids`
    via ``special_tokens={marker: reserved_id}`` — the markers split
    out before pre-tokenization and emit their reserved ids, so the
    final stream is ``[PRE] ids(prefix) [SUF] ids(suffix) [MID]
    ids(middle)`` where each piece is tokenized SEPARATELY (the
    stated char-grain/token-grain divergence: a cut can land inside
    what would have been one token, and concat-then-tokenize ≠
    tokenize-then-concat at the cut edges).

    Gate and cuts are the token-grain transform's derivations (md5
    bucket gate; full-width 60-bit draws mod (n + 1) over CHARACTER
    positions), so the whole rearrangement is engine-reproducible and
    oracle-restatable.  NULL text stays NULL.  Markers must be
    non-empty, distinct, and absent from the corpus (the caller's
    contract, same as reserved ids — the engine cannot police corpus
    content here without a full scan)."""
    toks = {"prefix_tok": prefix_tok, "middle_tok": middle_tok,
            "suffix_tok": suffix_tok}
    for name, v in toks.items():
        if not isinstance(v, str) or v == "":
            raise ValueError(
                f"fim_transform_text: {name} must be a non-empty "
                f"string, got {v!r}"
            )
    if len(set(toks.values())) != 3:
        raise ValueError(
            f"fim_transform_text: marker strings must be distinct, "
            f"got {toks}"
        )
    n = F.length(F.col(text_col))
    gate, c1, c2 = _gate_and_cuts(id_col, salt, fim_rate, n)
    # substring(text, start, length) is 1-based like slice
    prefix = F.col(text_col).substr(F.lit(1), c1)
    middle = F.col(text_col).substr(c1 + 1, c2 - c1)
    suffix = F.col(text_col).substr(c2 + 1, n - c2)
    psm = F.concat(
        F.lit(prefix_tok), prefix, F.lit(suffix_tok), suffix,
        F.lit(middle_tok), middle,
    )
    spm_txt = F.concat(
        F.lit(prefix_tok), F.lit(suffix_tok), suffix,
        F.lit(middle_tok), prefix, middle,
    )
    arranged = spm_txt if spm else psm
    return df.withColumn(
        text_col,
        F.when(F.col(text_col).isNull(), F.col(text_col))
        .when(gate, arranged)
        .otherwise(F.col(text_col)),
    )
