"""Unicode normalization kernels (functions/normalize.py):
differential against DuckDB's independent utf8proc implementation
(nfc_normalize / strip_accents), form semantics, the ASCII-invariance
claim behind the native pre-gate, and NULL handling."""

from __future__ import annotations

import random
import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from wikiextractor_spark.functions.normalize import (
    _normalize_one,
    _strip_accents_one,
    maybe_denormalized,
    strip_accents,
    unicode_normalize,
)

CASES = [
    "café menu",          # decomposed acute
    "café fixe",           # composed
    "Ångström",     # ring + diaeresis, decomposed
    "mañana vs mañana",
    "straße øre",     # no-decomposition chars pass through
    "ȩ́ order",      # canonical reordering: cedilla+acute
    "ȩ́ order",      # same marks, other source order
    "Å unit",              # ANGSTROM SIGN → Å under NFC
    "ﬁle ligature",        # fi ligature: NFC keeps, NFKC folds
    "plain ascii 123",
    "",
]


def test_differential_vs_duckdb_fixed_cases():
    con = duckdb.connect()
    for s in CASES:
        nfc_d, sa_d = con.execute(
            "SELECT nfc_normalize(?), strip_accents(?)", [s, s]
        ).fetchone()
        assert _normalize_one(s, "NFC") == nfc_d, repr(s)
        assert _strip_accents_one(s) == sa_d, repr(s)


def test_differential_vs_duckdb_fuzz():
    """Random base+combining soups: the two independent Unicode
    implementations must agree on NFC and accent stripping."""
    con = duckdb.connect()
    rng = random.Random(17)
    base = "aeounAEZ éñÅßøÅﬁ"
    marks = "̧̣́̀̈̊̃"
    for _ in range(500):
        s = "".join(
            rng.choice(base) + (
                "".join(
                    rng.choice(marks)
                    for _ in range(rng.randint(0, 3))
                )
            )
            for _ in range(rng.randint(1, 10))
        )
        nfc_d, sa_d = con.execute(
            "SELECT nfc_normalize(?), strip_accents(?)", [s, s]
        ).fetchone()
        assert _normalize_one(s, "NFC") == nfc_d, repr(s)
        assert _strip_accents_one(s) == sa_d, repr(s)


def test_form_semantics():
    # NFC composes; NFD decomposes; only the K forms fold
    # compatibility characters
    assert _normalize_one("é", "NFC") == "é"
    assert _normalize_one("é", "NFD") == "é"
    assert _normalize_one("ﬁ", "NFC") == "ﬁ"
    assert _normalize_one("ﬁ", "NFKC") == "fi"
    assert _normalize_one("Å", "NFC") == "Å"
    # idempotence
    for s in CASES:
        for form in ("NFC", "NFD", "NFKC", "NFKD"):
            once = _normalize_one(s, form)
            assert _normalize_one(once, form) == once


def test_ascii_invariance_backs_the_native_gate():
    """The maybe_denormalized pre-gate is sound: every pure-ASCII
    string is invariant under all four forms and accent stripping."""
    rng = random.Random(23)
    for _ in range(200):
        s = "".join(chr(rng.randint(0, 127)) for _ in range(20))
        for form in ("NFC", "NFD", "NFKC", "NFKD"):
            assert _normalize_one(s, form) == s
        assert _strip_accents_one(s) == s


def test_kernels_and_gate_on_spark(spark):
    df = spark.createDataFrame(
        [
            (1, "café menu"),
            (2, "plain ascii"),
            (3, None),
            (4, "straße øre"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["nfc"], r["folded"], r["gate"])
        for r in df.select(
            "doc_id",
            unicode_normalize("text").alias("nfc"),
            strip_accents("text").alias("folded"),
            maybe_denormalized("text").alias("gate"),
        ).collect()
    }
    assert rows[1] == ("café menu", "cafe menu", True)
    assert rows[2] == ("plain ascii", "plain ascii", False)
    assert rows[3] == (None, None, None)
    assert rows[4] == (
        "straße øre", "straße øre", True
    )


def test_invalid_form_raises():
    with pytest.raises(ValueError, match="form must be one of"):
        unicode_normalize("text", form="NFX")


def test_gated_composition_preserves_content(spark):
    """The when(gate, kernel) form is VALUE-equal to the ungated
    kernel (the battery's u_nfc pin) — the cost-skip itself lives in
    normalize_if_needed's split-path, tested separately."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)] + [(99, None)],
        "doc_id long, text string",
    )
    gated = df.select(
        "doc_id",
        F.when(
            maybe_denormalized("text"), unicode_normalize("text")
        ).otherwise(F.col("text")).alias("n"),
    )
    ungated = df.select(
        "doc_id", unicode_normalize("text").alias("n")
    )
    assert sorted(map(tuple, gated.collect())) == sorted(
        map(tuple, ungated.collect())
    )


def test_normalization_unifies_dedup_keys(spark):
    """The reason the operator exists: composed/decomposed twins
    collapse to one exact-dedup group after NFC."""
    from wikiextractor_spark.operators.dedup import (
        exact_duplicate_groups,
    )

    df = spark.createDataFrame(
        [(1, "café"), (2, "café")],
        "doc_id long, text string",
    )
    raw = exact_duplicate_groups(df.select("doc_id", "text"))
    assert raw.count() == 2  # distinct keys without normalization
    nfc = exact_duplicate_groups(
        df.select(
            "doc_id", unicode_normalize("text").alias("text")
        )
    ).collect()
    assert len(nfc) == 1 and nfc[0]["n_copies"] == 2


def test_normalize_if_needed_split_path(spark):
    """The split-path composition is value-equal to the ungated
    kernel, including NULL text, and the clean leg's plan carries no
    Python evaluation (the actual skip — a when() projection would
    still evaluate the UDF per row)."""
    from wikiextractor_spark.functions.normalize import (
        normalize_if_needed,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)] + [(99, None)],
        "doc_id long, text string",
    )
    gated = normalize_if_needed(df, "text", out_col="n")
    ungated = df.select(
        "doc_id", "text", unicode_normalize("text").alias("n")
    )
    assert sorted(map(tuple, gated.collect())) == sorted(
        map(tuple, ungated.collect())
    )
    # the clean leg (ASCII + NULL rows) must not contain a Python
    # evaluation node
    clean_leg = df.filter(
        maybe_denormalized("text").isNull() | ~maybe_denormalized("text")
    ).withColumn("n", F.col("text"))
    assert "ArrowEvalPython" not in clean_leg._jdf.queryExecution() \
        .executedPlan().toString()
    # in-place rewrite keeps the schema
    inplace = normalize_if_needed(df, "text")
    assert inplace.columns == df.columns


def test_nfkc_kernel_published_folds(spark):
    """Hand-stated NFKC folds through the Spark kernel vs
    unicodedata.normalize('NFKC') — the compatibility foldings the
    r16 tokenizer.json charsmap='nfkc' mode serves (ligature,
    full-width forms, superscripts, the Angstrom sign)."""
    import unicodedata

    from pyspark.sql import functions as F

    from wikiextractor_spark.functions.normalize import (
        unicode_normalize,
    )

    cases = ["ﬁle", "１２３ＡＢ", "x²", "Å", "½ cup", "ｶﾀｶﾅ"]
    want = [unicodedata.normalize("NFKC", t) for t in cases]
    assert want == ["file", "123AB", "x2", "Å", "1⁄2 cup", "カタカナ"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)],
        "doc_id long, text string",
    )
    got = [
        r["n"] for r in df.select(
            "doc_id", unicode_normalize(F.col("text"), "NFKC").alias("n")
        ).orderBy("doc_id").collect()
    ]
    assert got == want
