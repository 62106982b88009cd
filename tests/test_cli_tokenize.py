"""--source docs CLI tail (tokenize → [pack] → [shard]): end-to-end
runs per tokenizer mode on published-format artifacts, the shard
layout, and the flag-compat rejections."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.__main__ import main


@pytest.fixture()
def docs_parquet(spark, tmp_path):
    p = tmp_path / "docs"
    spark.createDataFrame(
        [
            (1, "unaffable running"),
            (2, "the data"),
            (3, None),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(p))
    return str(p)


@pytest.fixture()
def keep_session(spark, monkeypatch):
    # main() getOrCreate()s the fixture session — keep it alive
    monkeypatch.setattr(type(spark), "stop", lambda self: None)


WP_VOCAB = [
    "[UNK]", "un", "##aff", "##able", "runn", "##ing", "the",
    "dat", "##a",
]


def test_cli_wordpiece_tokenize(spark, tmp_path, docs_parquet,
                                keep_session):
    v = tmp_path / "vocab.txt"
    v.write_text("\n".join(WP_VOCAB) + "\n", encoding="utf-8")
    out = tmp_path / "ids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "wordpiece", "--vocab", str(v),
        "--out", str(out),
    ])
    rows = {
        r["doc_id"]: r["token_ids"]
        for r in spark.read.parquet(str(out)).collect()
    }
    vid = {t: i for i, t in enumerate(WP_VOCAB)}
    assert list(rows[1]) == [
        vid["un"], vid["##aff"], vid["##able"],
        vid["runn"], vid["##ing"],
    ]
    assert list(rows[2]) == [vid["the"], vid["dat"], vid["##a"]]
    assert rows[3] is None


def test_cli_bpe_tokenize_published_formats(spark, tmp_path,
                                            docs_parquet, keep_session):
    # byte-level artifacts in the published file formats
    vocab = {
        "Ġ": 0, "t": 1, "h": 2, "e": 3, "th": 4, "the": 5,
        "Ġt": 6, "Ġth": 7, "Ġthe": 8, "d": 9, "a": 10, "u": 11,
        "n": 12, "f": 13, "b": 14, "l": 15, "r": 16, "i": 17,
        "g": 18,
    }
    vp = tmp_path / "vocab.json"
    vp.write_text(json.dumps(vocab), encoding="utf-8")
    mp = tmp_path / "merges.txt"
    mp.write_text(
        "#version: 0.2\nt h\nth e\nĠ t\nĠt h\nĠth e\n",
        encoding="utf-8",
    )
    out = tmp_path / "bids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "bpe", "--vocab", str(vp),
        "--merges", str(mp), "--out", str(out),
    ])
    rows = {
        r["doc_id"]: r["token_ids"]
        for r in spark.read.parquet(str(out)).collect()
    }
    # exact expected streams, derived by hand from the artifacts:
    # "the data" pre-tokenizes to ["the", " data"]; the t-h/th-e
    # chain fuses "the" → id 5; no merge applies inside "Ġdata", so
    # its bytes serve per-symbol: Ġ d a t a → [0, 9, 10, 1, 10]
    assert list(rows[2]) == [5, 0, 9, 10, 1, 10]
    # "unaffable running": no merge applies anywhere — pure
    # byte-symbol ids
    vid = vocab
    exp1 = [vid[c] for c in "unaffable"] + [vid["Ġ"]] + [
        vid[c] for c in "running"
    ]
    assert list(rows[1]) == exp1
    assert rows[3] is None


def test_cli_unigram_tokenize(spark, tmp_path, docs_parquet,
                              keep_session):
    from wikiextractor_spark.functions.unigram import (
        save_unigram_lm,
        unigram_from_tokens,
    )

    lm = tmp_path / "lm"
    save_unigram_lm(
        unigram_from_tokens(
            spark,
            {"the": -2.0, "data": -2.5, "un": -3.0, "aff": -3.1,
             "able": -3.2, "runn": -3.3, "ing": -3.4,
             "a": -4.0, "e": -4.1, "t": -4.2, "h": -4.3, "d": -4.4},
            -10.0,
        ),
        str(lm),
    )
    out = tmp_path / "uids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "unigram", "--lm", str(lm),
        "--out", str(out),
    ])
    rows = {
        r["doc_id"]: r["token_ids"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert rows[2] is not None and len(rows[2]) == 2  # the + data
    assert rows[3] is None


def test_cli_pack_and_shards(spark, tmp_path, docs_parquet,
                             keep_session):
    v = tmp_path / "vocab.txt"
    v.write_text("\n".join(WP_VOCAB) + "\n", encoding="utf-8")
    out = tmp_path / "packed"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "wordpiece", "--vocab", str(v),
        "--pack", "8", "--shards", "2", "--shard-seed", "ep0",
        "--out", str(out),
    ])
    from wikiextractor_spark.sink import read_training_shards

    packs = read_training_shards(spark, str(out))
    rows = packs.collect()
    assert rows and all(r["n_tokens"] <= 8 for r in rows)
    # shard assignment follows the (pack_id, seed) contract
    for r in rows:
        exp = packs.sparkSession.createDataFrame(
            [(r["pack_id"],)], "pack_id long"
        ).select(
            F.pmod(
                F.xxhash64(F.col("pack_id").cast("string"), F.lit("ep0")),
                F.lit(2),
            ).cast("int").alias("s")
        ).collect()[0]["s"]
        assert r["shard_id"] == exp


def test_cli_docs_flag_compat(tmp_path):
    cases = [
        # docs flags with other sources
        ["--infn", "x", "--source", "dump", "--tokenize", "wordpiece"],
        ["--infn", "x", "--source", "wet", "--vocab", "v"],
        ["--infn", "x", "--source", "warc", "--pack", "8"],
        # docs without/with wrong artifacts
        ["--infn", "x", "--source", "docs"],
        ["--infn", "x", "--source", "docs", "--tokenize", "wordpiece"],
        ["--infn", "x", "--source", "docs", "--tokenize", "bpe",
         "--vocab", "v"],
        ["--infn", "x", "--source", "docs", "--tokenize", "unigram"],
        ["--infn", "x", "--source", "docs", "--tokenize", "wordpiece",
         "--vocab", "v", "--lm", "l"],
        ["--infn", "x", "--source", "docs", "--tokenize", "unigram",
         "--lm", "l", "--merges", "m"],
        # shard seed without shards would be silently ignored
        ["--infn", "x", "--source", "docs", "--tokenize", "wordpiece",
         "--vocab", "v", "--shard-seed", "ep1"],
        # basic-tokenize is a wordpiece-only stage
        ["--infn", "x", "--source", "docs", "--tokenize", "unigram",
         "--lm", "l", "--basic-tokenize"],
        ["--infn", "x", "--source", "wet", "--basic-tokenize"],
    ]
    for argv in cases:
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_runs_under_runpy(tmp_path, docs_parquet=None):
    """`python -m wikiextractor_spark` must reach --source docs: a
    def placed after the __main__ guard is invisible under runpy
    (r13 review — the tests import the module, which masks it).
    A usage error must also exit BEFORE any JVM boots (fast, and
    under getOrCreate it must never stop a session it doesn't own)."""
    import subprocess
    import sys
    import time

    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "wikiextractor_spark",
         "--infn", "x", "--source", "docs"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2, r.stderr
    assert "--tokenize" in r.stderr
    assert "NameError" not in r.stderr
    # no Spark session was booted for a usage error
    assert time.time() - t0 < 30
    assert "SparkContext" not in r.stderr


def test_cli_basic_tokenize_stage(spark, tmp_path, keep_session):
    """--basic-tokenize applies the published BasicTokenizer chain:
    cased text with attached punctuation serves through the uncased
    vocab instead of collapsing to [UNK]."""
    p = tmp_path / "cdocs"
    spark.createDataFrame(
        [(1, "The Data!")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(p))
    vocab = WP_VOCAB + ["!"]
    v = tmp_path / "vb.txt"
    v.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    vid = {t: i for i, t in enumerate(vocab)}
    out_raw = tmp_path / "raw"
    main([
        "--infn", str(p), "--source", "docs",
        "--tokenize", "wordpiece", "--vocab", str(v),
        "--out", str(out_raw),
    ])
    raw = spark.read.parquet(str(out_raw)).collect()[0]["token_ids"]
    assert list(raw) == [vid["[UNK]"], vid["[UNK]"]]  # cased + punct
    out_b = tmp_path / "basic"
    main([
        "--infn", str(p), "--source", "docs",
        "--tokenize", "wordpiece", "--vocab", str(v),
        "--basic-tokenize", "--out", str(out_b),
    ])
    got = spark.read.parquet(str(out_b)).collect()[0]["token_ids"]
    assert list(got) == [
        vid["the"], vid["dat"], vid["##a"], vid["!"],
    ]


def test_cli_prepare_stage(spark, tmp_path, keep_session):
    """--source docs prepare flags run prepare_corpus before the
    tail: prepare-only writes the prepared surface; prepare +
    tokenize composes."""
    p = tmp_path / "pdocs"
    spark.createDataFrame(
        [
            (1, "the data the data the data the data"),
            (2, "the data the data the data the data"),  # exact dup
            (3, "café data"),                     # decomposed é
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(p))
    out = tmp_path / "prepared"
    main([
        "--infn", str(p), "--source", "docs",
        "--dedup", "exact", "--normalize", "NFC",
        "--out", str(out),
    ])
    rows = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert set(rows) == {1, 3}          # dup dropped, min id kept
    assert "café" in rows[3]            # NFC-composed
    # prepare + tokenize in one invocation
    v = tmp_path / "vp.txt"
    v.write_text("\n".join(WP_VOCAB) + "\n", encoding="utf-8")
    out2 = tmp_path / "pids"
    main([
        "--infn", str(p), "--source", "docs",
        "--dedup", "exact", "--tokenize", "wordpiece",
        "--vocab", str(v), "--out", str(out2),
    ])
    ids = spark.read.parquet(str(out2))
    assert ids.count() == 2
    assert set(ids.columns) == {"doc_id", "token_ids"}


def test_cli_prepare_flag_compat(tmp_path):
    cases = [
        # prepare flags with other sources
        ["--infn", "x", "--source", "wet", "--target-lang", "en"],
        ["--infn", "x", "--source", "dump", "--normalize", "NFC"],
        ["--infn", "x", "--source", "warc", "--dedup", "exact"],
        # artifacts/pack/shard-seed without --tokenize
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--vocab", "v"],
        ["--infn", "x", "--source", "docs", "--normalize", "NFC",
         "--pack", "8"],
        ["--infn", "x", "--source", "docs", "--gopher",
         "--shard-seed", "ep1"],
        ["--infn", "x", "--source", "docs", "--min-quality", "0.5",
         "--basic-tokenize"],
        # bound check
        ["--infn", "x", "--source", "docs",
         "--sentence-span-dedup", "1"],
    ]
    for argv in cases:
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_langid_model_gate(spark, tmp_path, keep_session):
    """--langid-model routes the --target-lang gate through the
    TRAINED classifier (r14): documents the stopword heuristic would
    misroute gate correctly under the model."""
    from wikiextractor_spark.functions import langid

    fit = spark.createDataFrame(
        [
            (i, ["en", "de"][i % 2],
             ["the quick brown fox and the lazy dog it is for to in",
              "der schnelle braune fuchs und die faule katze ist von",
              ][i % 2] + f" {i}")
            for i in range(8)
        ],
        "doc_id long, lang string, text string",
    )
    model = langid.fit_langid(fit, n=3, buckets=256, salt="cli")
    mp = tmp_path / "lidmodel"
    langid.save_langid_model(model, str(mp))
    p = tmp_path / "ldocs"
    spark.createDataFrame(
        [
            (1, "die geschichte von einem hund und einem fuchs ist"),
            (2, "this is the story of a dog and a fox in the morning"),
            (3, "der braune hund ist nicht zu dem markt von heute"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(p))
    out = tmp_path / "lkept"
    main([
        "--infn", str(p), "--source", "docs",
        "--target-lang", "de", "--langid-model", str(mp),
        "--out", str(out),
    ])
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(str(out)).collect()
    )
    assert kept == [1, 3]


def test_cli_langid_model_flag_compat(tmp_path):
    cases = [
        # scoped to --source docs
        ["--infn", "x", "--source", "dump", "--langid-model", "m"],
        # requires --target-lang (the prepare_corpus contract, at the
        # parser boundary so no JVM boots)
        ["--infn", "x", "--source", "docs", "--langid-model", "m"],
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--langid-model", "m"],
    ]
    for argv in cases:
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_train_tokenizer_round_trips(spark, tmp_path, docs_parquet,
                                         keep_session):
    """--train-tokenizer: the no-Python TRAIN leg for all three
    families — each trained artifact then SERVES through the
    --tokenize path in a second invocation (r14)."""
    # unigram: train → serve
    m1 = tmp_path / "m_uni"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "unigram", "--vocab-size", "30",
        "--out-model", str(m1),
    ])
    out1 = tmp_path / "uids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "unigram", "--lm", f"{m1}/unigram_lm",
        "--out", str(out1),
    ])
    rows = {r["doc_id"]: r["token_ids"]
            for r in spark.read.parquet(str(out1)).collect()}
    assert rows[3] is None                      # NULL text
    assert all(x >= 0 for x in rows[1])         # full coverage
    # wordpiece: train → serve
    m2 = tmp_path / "m_wp"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "wordpiece", "--vocab-size", "40",
        "--out-model", str(m2),
    ])
    out2 = tmp_path / "wids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "wordpiece", "--vocab", f"{m2}/wp_vocab",
        "--out", str(out2),
    ])
    assert spark.read.parquet(str(out2)).count() == 3
    # bpe: train → serve through the engine parquet pair (char
    # grain — the artifact family implies the replay)
    m3 = tmp_path / "m_bpe"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "bpe", "--vocab-size", "40",
        "--out-model", str(m3),
    ])
    out3 = tmp_path / "bids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "bpe", "--vocab", f"{m3}/vocab",
        "--merges", f"{m3}/merges", "--out", str(out3),
    ])
    brows = {r["doc_id"]: r["token_ids"]
             for r in spark.read.parquet(str(out3)).collect()}
    assert brows[3] is None and len(brows[2]) >= 1


def test_cli_train_tokenizer_flag_compat(tmp_path):
    cases = [
        # one run, one product
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "unigram", "--vocab-size", "30", "--out-model", "m",
         "--tokenize", "unigram", "--lm", "l"],
        # required pair
        ["--infn", "x", "--source", "docs",
         "--train-tokenizer", "unigram", "--vocab-size", "30"],
        ["--infn", "x", "--source", "docs",
         "--train-tokenizer", "unigram", "--out-model", "m"],
        # train-only flags without the mode
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--vocab-size", "30"],
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--out-model", "m"],
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--train-sample-fraction", "0.5"],
        # bounds
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "unigram", "--vocab-size", "0", "--out-model", "m"],
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "unigram", "--vocab-size", "30", "--out-model", "m",
         "--train-sample-fraction", "1.5"],
        # scoped to --source docs
        ["--infn", "x", "--source", "dump",
         "--train-tokenizer", "bpe"],
        # bpe serve artifacts must be one family
        ["--infn", "x", "--source", "docs", "--tokenize", "bpe",
         "--vocab", "v.json", "--merges", "m_parquet"],
        ["--infn", "x", "--source", "docs", "--tokenize", "bpe",
         "--vocab", "v_parquet", "--merges", "m.txt"],
    ]
    for argv in cases:
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_train_tokenizer_rejects_out(tmp_path):
    """--out is discarded by the train leg, so supplying it must
    error (r14 review: the no-silently-ignored-flags discipline) —
    while the default stays fine."""
    with pytest.raises(SystemExit) as exc:
        main([
            "--infn", "x", "--source", "docs",
            "--train-tokenizer", "unigram", "--vocab-size", "30",
            "--out-model", "m", "--out", "somewhere",
        ])
    assert exc.value.code == 2


def test_cli_unigram_space_marker(spark, tmp_path, keep_session):
    """--space-marker serves a real SentencePiece-shaped artifact
    (▁-marked pieces) through the CLI (r14)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "spdocs"
    spark.createDataFrame(
        [(1, "the cat"), (2, None)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(p))
    lmform = {"▁the": -2.0, "▁cat": -2.5, "▁": -6.0,
              "t": -4.5, "h": -4.6, "e": -4.4, "c": -4.7, "a": -4.3}
    tbl = pa.table({
        "token": list(lmform) + [None],
        "logprob": list(lmform.values()) + [-10.0],
    })
    lmdir = tmp_path / "splm"
    lmdir.mkdir()
    pq.write_table(tbl, str(lmdir / "part-0.parquet"))
    out = tmp_path / "spids"
    main([
        "--infn", str(p), "--source", "docs",
        "--tokenize", "unigram", "--lm", str(lmdir),
        "--space-marker", "--out", str(out),
    ])
    rows = {r["doc_id"]: r["token_ids"]
            for r in spark.read.parquet(str(out)).collect()}
    ids = {t: i for i, t in enumerate(sorted(lmform))}
    assert list(rows[1]) == [ids["▁the"], ids["▁cat"]]
    assert rows[2] is None
    # scoped: unigram only
    with pytest.raises(SystemExit) as exc:
        main(["--infn", "x", "--source", "docs", "--tokenize",
              "wordpiece", "--vocab", "v", "--space-marker"])
    assert exc.value.code == 2
    with pytest.raises(SystemExit) as exc:
        main(["--infn", "x", "--source", "docs", "--dedup", "exact",
              "--space-marker"])
    assert exc.value.code == 2


def test_cli_space_marker_value_checked_pre_jvm(tmp_path):
    """An invalid marker VALUE exits 2 at the parser, never booting
    a JVM (r14 review; the validate-before-get_spark rule)."""
    for bad in ("--space-marker=", "--space-marker= "):
        with pytest.raises(SystemExit) as exc:
            main(["--infn", "x", "--source", "docs", "--tokenize",
                  "unigram", "--lm", "l", bad])
        assert exc.value.code == 2, bad


def test_cli_train_byte_level_round_trip(spark, tmp_path, docs_parquet,
                                         keep_session):
    """--train-tokenizer bpe --byte-level: trains at the published
    GPT-2 byte grain and exports vocab.json + merges.txt — the
    printed serve hint's invocation then tokenizes through the
    byte-level suffix dispatch, full coverage (no -1)."""
    m = tmp_path / "m_bl"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "bpe", "--vocab-size", "260",
        "--byte-level", "--out-model", str(m),
    ])
    assert (m / "vocab.json").exists()
    assert (m / "merges.txt").exists()
    obj = json.loads((m / "vocab.json").read_text(encoding="utf-8"))
    # 256 byte symbols + however many merges cleared min_count on
    # the tiny corpus (budget caps at 260), consistent across files
    n_rules = len(
        (m / "merges.txt").read_text(encoding="utf-8").splitlines()
    ) - 1  # minus the #version header
    assert 256 < len(obj) <= 260
    assert len(obj) == 256 + n_rules
    out = tmp_path / "blids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "bpe", "--vocab", str(m / "vocab.json"),
        "--merges", str(m / "merges.txt"), "--out", str(out),
    ])
    rows = {r["doc_id"]: r["token_ids"]
            for r in spark.read.parquet(str(out)).collect()}
    assert rows[3] is None
    assert all(x >= 0 for x in rows[1]) and all(x >= 0 for x in rows[2])


def test_cli_train_unigram_marker_round_trip(spark, tmp_path,
                                             docs_parquet, keep_session):
    """--train-tokenizer unigram --space-marker: trains at the
    marker grain; the artifact then serves under --space-marker
    (and would raise without the matching train grain)."""
    m = tmp_path / "m_usp"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "unigram", "--vocab-size", "32",
        "--space-marker", "--out-model", str(m),
    ])
    out = tmp_path / "uspids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "unigram", "--lm", f"{m}/unigram_lm",
        "--space-marker", "--out", str(out),
    ])
    rows = {r["doc_id"]: r["token_ids"]
            for r in spark.read.parquet(str(out)).collect()}
    assert rows[3] is None and all(x >= 0 for x in rows[1])


def test_cli_train_new_flag_compat():
    """r15 flag rejections: --byte-level outside --train-tokenizer
    bpe; --space-marker on the wrong train family; a bad marker
    VALUE pre-JVM on the train leg."""
    cases = [
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "unigram", "--vocab-size", "30", "--out-model", "m",
         "--byte-level"],
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "wordpiece", "--vocab-size", "30", "--out-model", "m",
         "--byte-level"],
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--byte-level"],
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "bpe", "--vocab-size", "300", "--out-model", "m",
         "--space-marker"],
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "unigram", "--vocab-size", "30", "--out-model", "m",
         "--space-marker", "a b"],
        ["--infn", "x", "--source", "dump", "--byte-level"],
        # the 256-byte alphabet leaves no merge budget (pre-JVM)
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "bpe", "--vocab-size", "256", "--out-model", "m",
         "--byte-level"],
    ]
    for argv in cases:
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_train_prune_rank(spark, tmp_path, docs_parquet,
                              keep_session):
    """--prune-rank loss trains end-to-end; the flag is rejected
    outside --train-tokenizer unigram."""
    m = tmp_path / "m_loss"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "unigram", "--vocab-size", "30",
        "--prune-rank", "loss", "--out-model", str(m),
    ])
    from wikiextractor_spark.functions.unigram import load_unigram_lm

    assert load_unigram_lm(spark, f"{m}/unigram_lm").count() > 1
    # the published .vocab TSV rides beside the parquet (r15) and
    # reloads to the SAME model through the TSV path
    pq = {
        (r["token"], r["logprob"])
        for r in load_unigram_lm(spark, f"{m}/unigram_lm").collect()
        if r["token"] is not None
    }
    tsv = {
        (r["token"], r["logprob"])
        for r in load_unigram_lm(
            spark, f"{m}/unigram.vocab", fmt="tsv", unk_logprob=0.0
        ).collect()
        if r["token"] is not None
    }
    assert tsv == pq
    for argv in (
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "bpe", "--vocab-size", "300", "--out-model", "m",
         "--prune-rank", "loss"],
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--prune-rank", "count"],
        ["--infn", "x", "--source", "dump", "--prune-rank", "loss"],
    ):
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_train_byte_level_zero_merges_clean_error(
    spark, tmp_path, keep_session
):
    """A corpus where no byte pair reaches min_count trains zero
    merges — the published merges.txt cannot be empty, so the CLI
    exits with the CAUSE instead of a traceback, and no partial
    published artifacts are written (r15 second review)."""
    p = tmp_path / "tinydocs"
    spark.createDataFrame(
        [(1, "ab")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(p))
    m = tmp_path / "m_zero"
    with pytest.raises(SystemExit) as exc:
        main([
            "--infn", str(p), "--source", "docs",
            "--train-tokenizer", "bpe", "--vocab-size", "257",
            "--byte-level", "--out-model", str(m),
        ])
    assert "ZERO merges" in str(exc.value)
    assert not (m / "vocab.json").exists()
    assert not (m / "merges.txt").exists()


def test_cli_train_wordpiece_basic_tokenize_round_trip(
    spark, tmp_path, keep_session
):
    """--train-tokenizer wordpiece --basic-tokenize trains the
    normalized grain; serving the artifact with --basic-tokenize
    UNKs nothing on the training corpus.  The flag stays rejected on
    the other train families."""
    p = tmp_path / "cased_docs"
    spark.createDataFrame(
        [(1, "Café DON'T stop"), (2, "The DATA, the data."), (3, None)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(p))
    m = tmp_path / "m_wpb"
    main([
        "--infn", str(p), "--source", "docs",
        "--train-tokenizer", "wordpiece", "--vocab-size", "60",
        "--basic-tokenize", "--out-model", str(m),
    ])
    out = tmp_path / "wpb_ids"
    main([
        "--infn", str(p), "--source", "docs",
        "--tokenize", "wordpiece", "--vocab", f"{m}/wp_vocab",
        "--basic-tokenize", "--out", str(out),
    ])
    from wikiextractor_spark.functions.wordpiece import (
        load_wordpiece_vocab,
    )

    toks = [
        r["token"]
        for r in load_wordpiece_vocab(spark, f"{m}/wp_vocab")
        .orderBy("token_id").collect()
    ]
    unk_id = toks.index("[UNK]")
    rows = {r["doc_id"]: r["token_ids"]
            for r in spark.read.parquet(str(out)).collect()}
    assert rows[3] is None
    assert unk_id not in list(rows[1]) and unk_id not in list(rows[2])
    for argv in (
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "unigram", "--vocab-size", "30", "--out-model", "m",
         "--basic-tokenize"],
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "bpe", "--vocab-size", "300", "--out-model", "m",
         "--basic-tokenize"],
    ):
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_train_special_token(spark, tmp_path, docs_parquet,
                                 keep_session):
    """--special-token reserves the text at the END of the trained
    id space (and in the exported vocab.json under --byte-level);
    scope/shape rejections are pre-JVM."""
    m = tmp_path / "m_sp"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "bpe", "--vocab-size", "258",
        "--byte-level", "--special-token", "<|endoftext|>",
        "--out-model", str(m),
    ])
    obj = json.loads((m / "vocab.json").read_text(encoding="utf-8"))
    assert obj["<|endoftext|>"] == max(obj.values())
    for argv in (
        # r15: --special-token now applies to every train family,
        # but the BasicTokenizer grain would mangle the literals
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "wordpiece", "--vocab-size", "30", "--out-model", "m",
         "--basic-tokenize", "--special-token", "<s>"],
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--special-token", "<s>"],
        ["--infn", "x", "--source", "docs", "--train-tokenizer",
         "bpe", "--vocab-size", "300", "--out-model", "m",
         "--special-token", "a b"],
        ["--infn", "x", "--source", "dump", "--special-token", "<s>"],
    ):
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_tokenizer_json_serve(spark, tmp_path, docs_parquet,
                                  keep_session):
    """--tokenizer-json: train byte-level BPE with a reserved
    special, then serve the written single file — the id stream
    equals the two-artifact vocab.json/merges.txt serve, and the
    added token rides the file (no flags).  Composes with --pack."""
    m = tmp_path / "m_tj"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "bpe", "--vocab-size", "259",
        "--byte-level", "--special-token", "<|endoftext|>",
        "--out-model", str(m),
    ])
    assert (m / "tokenizer.json").exists()
    obj = json.loads((m / "tokenizer.json").read_text("utf-8"))
    assert obj["model"]["type"] == "BPE"
    assert obj["pre_tokenizer"]["type"] == "ByteLevel"
    assert [t["content"] for t in obj["added_tokens"]] == [
        "<|endoftext|>"
    ]
    out_tj = tmp_path / "tjids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenizer-json", str(m / "tokenizer.json"),
        "--out", str(out_tj),
    ])
    out_2f = tmp_path / "f2ids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "bpe", "--vocab", str(m / "vocab.json"),
        "--merges", str(m / "merges.txt"), "--out", str(out_2f),
    ])
    tj = {r["doc_id"]: r["token_ids"]
          for r in spark.read.parquet(str(out_tj)).collect()}
    f2 = {r["doc_id"]: r["token_ids"]
          for r in spark.read.parquet(str(out_2f)).collect()}
    assert tj == f2
    assert tj[3] is None
    # --pack composes exactly like the per-family modes
    packed = tmp_path / "tjpack"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenizer-json", str(m / "tokenizer.json"),
        "--pack", "8", "--out", str(packed),
    ])
    prows = spark.read.parquet(str(packed))
    assert prows.count() > 0
    assert "pack_id" in prows.columns


def test_cli_train_unigram_writes_tokenizer_json(spark, tmp_path,
                                                 docs_parquet,
                                                 keep_session):
    """The unigram train leg writes tokenizer.json beside the
    parquet/.vocab pair — marker grain carried in the Metaspace
    block — and --tokenizer-json serves it end to end."""
    m = tmp_path / "m_uni"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "unigram", "--vocab-size", "24",
        "--space-marker", "▁", "--out-model", str(m),
    ])
    assert (m / "tokenizer.json").exists()
    obj = json.loads((m / "tokenizer.json").read_text("utf-8"))
    assert obj["model"]["type"] == "Unigram"
    assert obj["pre_tokenizer"] == {
        "type": "Metaspace", "replacement": "▁",
        "prepend_scheme": "always", "split": True,
    }
    out = tmp_path / "uids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenizer-json", str(m / "tokenizer.json"),
        "--out", str(out),
    ])
    rows = {r["doc_id"]: r["token_ids"]
            for r in spark.read.parquet(str(out)).collect()}
    assert rows[3] is None
    assert len(rows[1]) > 0 and len(rows[2]) > 0


def test_cli_train_wordpiece_tokenizer_json_round_trip(
    spark, tmp_path, docs_parquet, keep_session,
):
    """The WordPiece train leg writes tokenizer.json (the trained
    vocabulary always carries [UNK] at id 0) — at the basic grain
    the file declares the BertNormalizer pair, and --tokenizer-json
    serves the identical stream to the per-family serve hint."""
    m = tmp_path / "m_wp"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "wordpiece", "--vocab-size", "30",
        "--basic-tokenize", "--out-model", str(m),
    ])
    obj = json.loads((m / "tokenizer.json").read_text("utf-8"))
    assert obj["model"]["type"] == "WordPiece"
    assert obj["model"]["unk_token"] == "[UNK]"
    assert obj["normalizer"]["type"] == "BertNormalizer"
    assert obj["pre_tokenizer"] == {"type": "BertPreTokenizer"}
    out_tj = tmp_path / "wptj"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenizer-json", str(m / "tokenizer.json"),
        "--out", str(out_tj),
    ])
    out_pf = tmp_path / "wppf"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenize", "wordpiece", "--vocab", str(m / "wp_vocab"),
        "--basic-tokenize", "--out", str(out_pf),
    ])
    tj = {r["doc_id"]: r["token_ids"]
          for r in spark.read.parquet(str(out_tj)).collect()}
    pf = {r["doc_id"]: r["token_ids"]
          for r in spark.read.parquet(str(out_pf)).collect()}
    assert tj == pf
    assert tj[3] is None


def test_cli_tokenizer_json_flag_compat(tmp_path):
    cases = [
        # one serve mode each
        ["--infn", "x", "--source", "docs", "--tokenizer-json", "t",
         "--tokenize", "wordpiece", "--vocab", "v"],
        # one run each with the train leg
        ["--infn", "x", "--source", "docs", "--tokenizer-json", "t",
         "--train-tokenizer", "bpe", "--vocab-size", "300",
         "--out-model", "m"],
        # per-family artifact flags require --tokenize
        ["--infn", "x", "--source", "docs", "--tokenizer-json", "t",
         "--vocab", "v"],
        ["--infn", "x", "--source", "docs", "--tokenizer-json", "t",
         "--lm", "l"],
        # grain flags stay per-family (the file is authoritative)
        ["--infn", "x", "--source", "docs", "--tokenizer-json", "t",
         "--basic-tokenize"],
        ["--infn", "x", "--source", "docs", "--tokenizer-json", "t",
         "--space-marker", "▁"],
        # docs-only scope
        ["--infn", "x", "--source", "dump", "--tokenizer-json", "t"],
        # pack/shards still need an id stream source
        ["--infn", "x", "--source", "docs", "--dedup", "exact",
         "--pack", "8"],
    ]
    for argv in cases:
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_train_wordpiece_special_token(spark, tmp_path,
                                           docs_parquet, keep_session):
    """--special-token on the wordpiece train leg: specials FIRST
    (the published BERT-trainer layout), carried as added_tokens in
    the written tokenizer.json, and --tokenizer-json serving emits
    the reserved ids around real text."""
    m = tmp_path / "m_wps"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "wordpiece", "--vocab-size", "40",
        "--special-token", "[CLS]", "--special-token", "[SEP]",
        "--out-model", str(m),
    ])
    lines = (m / "vocab.txt").read_text("utf-8").splitlines()
    assert lines[:3] == ["[CLS]", "[SEP]", "[UNK]"]
    obj = json.loads((m / "tokenizer.json").read_text("utf-8"))
    assert [(t["content"], t["id"]) for t in obj["added_tokens"]] == [
        ("[CLS]", 0), ("[SEP]", 1),
    ]
    # serve a text carrying the literal specials through the file
    docs2 = tmp_path / "docs2"
    spark.createDataFrame(
        [(1, "[CLS]the data[SEP]")], "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(docs2))
    out = tmp_path / "wpsids"
    main([
        "--infn", str(docs2), "--source", "docs",
        "--tokenizer-json", str(m / "tokenizer.json"),
        "--out", str(out),
    ])
    got = list(
        spark.read.parquet(str(out)).collect()[0]["token_ids"]
    )
    assert got[0] == 0 and got[-1] == 1


def test_cli_train_unigram_special_token(spark, tmp_path,
                                         docs_parquet, keep_session):
    """--special-token on the unigram train leg: protected from
    training, reserved beyond the piece table in the written
    tokenizer.json, served through --tokenizer-json."""
    m = tmp_path / "m_unis"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "unigram", "--vocab-size", "20",
        "--special-token", "<doc>", "--out-model", str(m),
    ])
    obj = json.loads((m / "tokenizer.json").read_text("utf-8"))
    n_entries = len(obj["model"]["vocab"])
    assert [(t["content"], t["id"]) for t in obj["added_tokens"]] == [
        ("<doc>", n_entries),
    ]
    assert all(t != "<doc>" for t, _s in obj["model"]["vocab"])
    docs2 = tmp_path / "docs3"
    spark.createDataFrame(
        [(1, "the<doc>data")], "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(docs2))
    out = tmp_path / "unisids"
    main([
        "--infn", str(docs2), "--source", "docs",
        "--tokenizer-json", str(m / "tokenizer.json"),
        "--out", str(out),
    ])
    got = list(
        spark.read.parquet(str(out)).collect()[0]["token_ids"]
    )
    assert n_entries in got


def test_cli_train_unigram_unk_special_skips_json(
    spark, tmp_path, docs_parquet, keep_session, capsys,
):
    """--special-token '<unk>' on the unigram leg: the single-file
    export would contradict itself on the text's id, so it is
    skipped WITH the cause — never a broken file, never a crash
    after the training run."""
    m = tmp_path / "m_unk"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--train-tokenizer", "unigram", "--vocab-size", "20",
        "--special-token", "<unk>", "--out-model", str(m),
    ])
    assert (m / "unigram_lm").exists()
    assert not (m / "tokenizer.json").exists()
    assert "tokenizer.json not written" in capsys.readouterr().out


def test_cli_tokenizer_json_prints_divergences(
    spark, tmp_path, docs_parquet, keep_session, capsys,
):
    """Stated divergences of the served file are VISIBLE on the
    serve leg, not buried on the model object."""
    obj = {
        "normalizer": {"type": "Precompiled",
                       "precompiled_charsmap": "x"},
        "pre_tokenizer": {"type": "WhitespaceSplit"},
        "model": {
            "type": "Unigram", "unk_id": 0,
            "vocab": [["<unk>", 0.0], ["the", -2.0], ["dat", -2.5],
                      ["a", -4.0], ["t", -4.1], ["e", -4.2],
                      ["h", -4.3], ["d", -4.4]],
        },
    }
    p = tmp_path / "t.json"
    p.write_text(json.dumps(obj), encoding="utf-8")
    out = tmp_path / "divids"
    main([
        "--infn", docs_parquet, "--source", "docs",
        "--tokenizer-json", str(p), "--out", str(out),
    ])
    printed = capsys.readouterr().out
    assert "stated divergences" in printed
    assert "normalizer:Precompiled" in printed


def test_cli_charsmap_flag(spark, tmp_path, keep_session):
    """--charsmap nfkc serves a Precompiled-bearing file through the
    NFKC kernel over NFKC-UNSTABLE text (the ids depend on the fold
    actually running); the flag outside --tokenizer-json — or on a
    Precompiled-free file — errors instead of being discarded."""
    docs = tmp_path / "nfkc_docs"
    spark.createDataFrame(
        # full-width 'ｔｈｅ' + the fi ligature: NFKC-unstable — under
        # charsmap='record' every character is UNK
        [(1, "ｔｈｅ ﬁle")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(docs))
    obj = {
        "normalizer": {"type": "Precompiled",
                       "precompiled_charsmap": "blob"},
        "pre_tokenizer": {"type": "WhitespaceSplit"},
        "model": {
            "type": "Unigram", "unk_id": 0,
            "vocab": [
                ["<unk>", 0.0], ["the", -2.0], ["file", -2.5],
            ],
        },
    }
    p = tmp_path / "sp.json"
    p.write_text(json.dumps(obj), encoding="utf-8")
    out = tmp_path / "nfkc_ids"
    main([
        "--infn", str(docs), "--source", "docs",
        "--tokenizer-json", str(p), "--charsmap", "nfkc",
        "--out", str(out),
    ])
    rows = {r["doc_id"]: r["token_ids"]
            for r in spark.read.parquet(str(out)).collect()}
    # NFKC folds ｔｈｅ → the (position 1) and ﬁle → file (2);
    # without the fold both words would be all-UNK (-1 streams)
    assert rows[1] == [1, 2]
    # the flag outside --tokenizer-json errors (even at the default
    # value — supplied-but-discarded)
    with pytest.raises(SystemExit):
        main([
            "--infn", str(docs), "--source", "docs",
            "--tokenize", "unigram", "--charsmap", "nfkc",
            "--out", str(tmp_path / "x"),
        ])
    # and on a non-docs source the scoped-flag policy rejects it
    with pytest.raises(SystemExit):
        main([
            "--infn", str(docs), "--source", "wet",
            "--charsmap", "nfkc", "--out", str(tmp_path / "y"),
        ])
    # nfkc asserted against a Precompiled-FREE file raises instead
    # of silently serving raw text
    obj2 = dict(obj)
    del obj2["normalizer"]
    p2 = tmp_path / "plain.json"
    p2.write_text(json.dumps(obj2), encoding="utf-8")
    with pytest.raises(ValueError, match="carries none"):
        main([
            "--infn", str(docs), "--source", "docs",
            "--tokenizer-json", str(p2), "--charsmap", "nfkc",
            "--out", str(tmp_path / "z"),
        ])
