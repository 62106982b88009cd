"""Benchmark decontamination for LLM training data: flag and remove
corpus documents that overlap an evaluation set.

The standard recipe (used for GPT-3/PaLM-style training-set hygiene):
normalize text, take every ``n``-gram (n=13 by default), and call a
document contaminated when the fraction of its n-grams that also
appear anywhere in the benchmark set exceeds a threshold.

100 TB shape
------------
* The corpus side is ONE narrow pass: normalize + split + hash each
  n-gram with ``xxhash64`` (JVM, whole-stage codegen — no Python, no
  crypto hash), explode, and carry ``n_grams`` through the explode so
  the document grain never has to be recomputed or re-joined.
* The benchmark side is tiny by construction (eval sets are MBs
  against a 100 TB corpus), so its distinct gram-hash set is
  **broadcast**: the gram match is a BroadcastHashJoin — no shuffle
  of the exploded corpus.
* The only shuffle is the per-document rollup, keyed on the doc id
  with map-side partial aggregation.

Documents shorter than ``n`` words contribute their full word
sequence as a single gram, so short docs that literally equal a short
benchmark item still match (fraction 1.0) instead of silently having
zero grams.

No reference counterpart (`/root/reference/WikiExtractor.py` has no
dedup/decontamination surface) — this is part of the engine's
training-data-pipeline extension (SURVEY.md §2.12).
"""

from __future__ import annotations

import warnings

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _norm_words_sql(text_col: str) -> str:
    """Lowercase, strip non-alphanumerics, collapse runs → word array."""
    return (
        f"split(trim(regexp_replace(lower({text_col}), "
        f"'[^a-z0-9]+', ' ')), ' ')"
    )


def _grams_expr(text_col: str, n: int) -> F.Column:
    """Array of xxhash64'd word ``n``-grams; whole doc when shorter
    than ``n`` words.  The split is bound once per row via the
    one-element-array idiom (see dedup._shingles_sql)."""
    return F.expr(
        f"""
        transform(array({_norm_words_sql(text_col)}), ws ->
          CASE WHEN size(ws) < {n}
               THEN array(xxhash64(concat_ws(' ', ws)))
               ELSE transform(sequence(0, size(ws) - {n}),
                              i -> xxhash64(concat_ws(' ', slice(ws, i + 1, {n}))))
          END)[0]
        """
    )


def doc_ngram_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """→ ``(id_col, n_grams, gram_hash)``: one row per normalized
    word ``n``-gram, hashed to a bigint.  ``n_grams`` (the document's
    total gram count) rides along so downstream rollups never need a
    second pass over the text.
    """
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    # bind the split once via the one-element-array idiom
    # (see dedup._shingles_sql): ws is evaluated a single time per row
    return _explode_with_count(df, text_col, id_col, n)


def _explode_with_count(
    df: DataFrame, text_col: str, id_col: str, n: int,
) -> DataFrame:
    """``(id, n_grams, gram_hash)`` with the gram array materialized
    in its own projection first — referencing the array expression
    directly from both ``size`` and ``explode`` in one select would
    evaluate the full hashing pass twice per row (CollapseProject
    declines to merge these, keeping one evaluation).

    ``explode_outer`` rather than ``explode``: plain explode plants an
    implicit ``size(e) > 0 AND isnotnull(e)`` filter that gets pushed
    below the projection and re-evaluates the whole hashing expression
    two more times per row (plan-verified).  The gram array is never
    empty — docs shorter than ``n`` words emit one whole-doc gram — so
    the outer variant is semantically identical and 3× cheaper."""
    return (
        df.select(F.col(id_col), _grams_expr(text_col, n).alias("_grams"))
        .select(
            F.col(id_col),
            F.size("_grams").alias("n_grams"),
            F.explode_outer("_grams").alias("gram_hash"),
        )
    )


def benchmark_gram_set(
    benchmark: DataFrame, text_col: str = "text", n: int = 13,
) -> DataFrame:
    """Distinct gram hashes of the benchmark set — the broadcast side."""
    grams = _grams_expr(text_col, n)
    return (
        benchmark.select(F.explode(grams).alias("gram_hash")).distinct()
    )


def contamination_report(
    docs: DataFrame, benchmark: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    n: int = 13, threshold: float = 0.1,
) -> DataFrame:
    """→ ``(id_col, n_grams, n_hits, hit_frac, contaminated)`` per
    document: how many of its ``n``-grams appear in the benchmark.

    One corpus pass, one broadcast join, one rollup shuffle.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"need 0 < threshold <= 1, got {threshold}")
    bench = F.broadcast(
        benchmark_gram_set(benchmark, text_col=text_col, n=n)
        .withColumn("_hit", F.lit(1))
    )
    # carry n_grams through the explode: the doc grain is rebuilt by
    # the rollup itself — no second scan, no self-join
    exploded = _explode_with_count(docs, text_col, id_col, n)
    return (
        exploded.join(bench, "gram_hash", "left")
        .groupBy(id_col, "n_grams")
        .agg(F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hits"))
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            "n_hits",
            (F.col("n_hits") / F.col("n_grams")).alias("hit_frac"),
            (F.col("n_hits") / F.col("n_grams") >= threshold).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame, benchmark: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    n: int = 13, threshold: float = 0.1,
    benchmark_broadcast: bool = True,
) -> DataFrame:
    """Drop contaminated documents: ``docs`` minus every row whose
    benchmark ``n``-gram overlap fraction reaches ``threshold``.

    The flagged-id list is usually small (contamination is rare), so
    the anti-join is AQE-broadcastable at runtime; the corpus is
    touched exactly twice (flag pass + anti-join probe).

    ``benchmark_broadcast=False`` switches the flag pass to
    :func:`contamination_report_bloom` for benchmarks whose gram set
    exceeds the broadcast budget (decontaminating against another
    corpus / all prior training data): a few-MB Bloom bitmap replaces
    the broadcast, with an exact semi-join on the candidate sliver
    keeping results identical.
    """
    report = contamination_report if benchmark_broadcast else contamination_report_bloom
    flagged = (
        report(
            docs, benchmark, text_col=text_col, id_col=id_col,
            n=n, threshold=threshold,
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")


# --------------------------------------------------------------------------
# Large-benchmark path: Bloom-prefiltered decontamination
# --------------------------------------------------------------------------
#
# The broadcast path above assumes the benchmark gram set fits the
# broadcast budget (true for MB-scale eval sets).  When the benchmark
# is itself large — decontaminating against another CORPUS, a giant
# eval union, or all prior training data — broadcasting its distinct
# gram hashes stops being possible, and the naive alternative
# (shuffle-joining the exploded 100 TB corpus against the benchmark on
# gram_hash) shuffles the entire exploded corpus.
#
# The Bloom path keeps corpus-scale work NARROW: a bitmap over the
# benchmark gram hashes (built distributed, OR-merged on the driver,
# re-broadcast as a few MB regardless of benchmark cardinality)
# prefilters corpus grams to candidates = true hits + false positives;
# only that sliver shuffles into an EXACT semi-join against the
# benchmark gram set, so false positives are removed and the report is
# bit-identical to the broadcast path.  Bloom filters have no false
# negatives, so no hit can be missed.

_SPLITMIX_1 = 0x9E3779B97F4A7C15
_SPLITMIX_2 = 0xBF58476D1CE4E5B9
_SPLITMIX_3 = 0x94D049BB133111EB


def _splitmix64_np(x):
    """Vectorized splitmix64 finalizer: the second, independent hash
    the Kirsch-Mitzenmacher double-hashing scheme needs, derived from
    the stored xxhash64 value so build and probe agree without a
    second JVM hash column."""
    import numpy as np

    z = (x + np.uint64(_SPLITMIX_1)).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z = (z * np.uint64(_SPLITMIX_2)).astype(np.uint64)
    z ^= z >> np.uint64(27)
    z = (z * np.uint64(_SPLITMIX_3)).astype(np.uint64)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(h1, m_bits: int, k: int):
    """k probe positions per hash (Kirsch-Mitzenmacher: h1 + i*h2)."""
    import numpy as np

    h1 = h1.astype(np.uint64)
    h2 = _splitmix64_np(h1) | np.uint64(1)  # odd => full-period stride
    m = np.uint64(m_bits)
    return [
        ((h1 + np.uint64(i) * h2) % m).astype(np.int64) for i in range(k)
    ]


def sized_m_bits(n_grams: int, bits_per_gram: int = 10, floor: int = 1 << 20) -> int:
    """Bloom size for ``n_grams`` distinct grams: ~``bits_per_gram``
    bits each (k=6 at 10 bits/gram ≈ 1% FPR), rounded UP to a power
    of two so the Kirsch-Mitzenmacher modulo stays cheap and the
    bitmap never shrinks below ``floor`` bits."""
    want = max(floor, n_grams * bits_per_gram)
    return 1 << (want - 1).bit_length()


def build_bloom(
    hashes: DataFrame, m_bits: int = 1 << 24, k: int = 6,
    build_partitions: int = 8,
):
    """Bloom bitmap (numpy uint8 array, m_bits/8 bytes) over a bigint
    ``gram_hash`` column.  Each build partition sets bits into its own
    bitmap (numpy, vectorized); the driver ORs ``build_partitions``
    bitmaps — the only driver-side cost is partitions × m_bits/8
    bytes, independent of benchmark cardinality."""
    import numpy as np

    if m_bits % 8:
        raise ValueError(f"m_bits must be a multiple of 8, got {m_bits}")

    def _partition_bitmap(iterator):
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        saw = False
        for pdf in iterator:
            vals = pdf["gram_hash"].to_numpy(dtype=np.int64)
            if not len(vals):
                continue
            saw = True
            for pos in _bloom_positions(vals.view(np.uint64), m_bits, k):
                np.bitwise_or.at(
                    bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
        yield pd.DataFrame({"bitmap": [bitmap.tobytes() if saw else b""]})

    parts = (
        hashes.select("gram_hash")
        .repartition(build_partitions)
        .mapInPandas(_partition_bitmap, schema="bitmap binary")
        .collect()
    )
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts:
        if row["bitmap"]:
            out |= np.frombuffer(bytes(row["bitmap"]), dtype=np.uint8)
    return out


def contamination_report_bloom(
    docs: DataFrame, benchmark: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    n: int = 13, threshold: float = 0.1,
    m_bits: int | None = None, k: int = 6,
) -> DataFrame:
    """:func:`contamination_report` for benchmarks too large to
    broadcast — same output, bit for bit (differential-tested).

    ``m_bits=None`` (default) sizes the bitmap from the benchmark's
    own distinct-gram count (~10 bits/gram, power-of-two, ≥2^20) —
    a fixed size would silently degrade to FPR→1 on "all prior
    training data"-scale benchmarks, turning the candidate sliver
    into the whole exploded corpus.  Pass an explicit ``m_bits`` to
    pin the size; a >50% fill ratio raises a ``UserWarning`` either
    way (correctness is unaffected, the narrow-scan benefit is).

    Corpus-scale stages stay narrow: gram + explode (no shuffle),
    Bloom probe (Arrow-batched numpy against the broadcast bitmap —
    the one Python stage, vectorized per batch).  Only candidate rows
    (true hits + Bloom false positives, a sliver of the corpus) enter
    the exact semi-join that removes false positives; the benchmark
    side shuffles once, bounded by benchmark size.  Per-doc gram
    counts come from a second narrow pass over the text rather than a
    corpus-wide rollup of exploded rows, and the final hit-count join
    is AQE-broadcastable because contaminated docs are rare."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"need 0 < threshold <= 1, got {threshold}")

    bench_hashes = benchmark_gram_set(benchmark, text_col=text_col, n=n)
    auto_sized = m_bits is None
    if auto_sized:
        # one count over the (cached) gram set buys a bitmap that
        # tracks benchmark scale instead of hoping 2^24 is enough
        bench_hashes = bench_hashes.persist()
        m_bits = sized_m_bits(bench_hashes.count())
    bitmap = build_bloom(bench_hashes, m_bits=m_bits, k=k)
    if auto_sized:
        # the cache served count + build; release it now rather than
        # leak one persisted gram set per call — the exact semi-join
        # below recomputes the (benchmark-sized, narrow) set once
        bench_hashes.unpersist()
    # popcount via a 256-entry LUT: np.unpackbits would materialize
    # 8x the bitmap (8 GB transient for a 2^33-bit auto-sized bloom —
    # exactly the huge-benchmark scale this path exists for); the LUT
    # gather is 1x and the dtype'd sum avoids a widening copy
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    fill = float(lut[bitmap].sum(dtype=np.uint64)) / m_bits
    if fill > 0.5:
        warnings.warn(
            f"bloom fill ratio {fill:.2f} > 0.5 at m_bits={m_bits}: "
            "false-positive rate is degrading; pass a larger m_bits "
            "(or leave m_bits=None to auto-size)",
            stacklevel=2,
        )
    bitmap_bc = docs.sparkSession.sparkContext.broadcast(bitmap.tobytes())

    @pandas_udf("boolean")
    def _may_contain(h: pd.Series) -> pd.Series:
        bm = np.frombuffer(bitmap_bc.value, dtype=np.uint8)
        vals = h.to_numpy(dtype=np.int64).view(np.uint64)
        ok = np.ones(len(vals), dtype=bool)
        for pos in _bloom_positions(vals, m_bits, k):
            ok &= (bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(ok)

    exploded = _explode_with_count(docs, text_col, id_col, n)
    candidates = exploded.filter(_may_contain(F.col("gram_hash")))
    hit_counts = (
        candidates.join(bench_hashes, "gram_hash", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    # gram COUNT is pure arithmetic on the word count — no second
    # hashing pass over the corpus (F.size(_grams_expr(...)) would
    # re-run normalize+split+xxhash64 per doc just to count): docs
    # shorter than n words emit exactly one whole-doc gram, others
    # emit n_words - n + 1
    doc_grain = docs.select(
        F.col(id_col),
        F.expr(
            f"transform(array({_norm_words_sql(text_col)}), ws -> "
            f"IF(size(ws) < {n}, 1, size(ws) - {n} + 1))[0]"
        ).cast("long").alias("n_grams"),
    )
    return (
        doc_grain.join(hit_counts, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            (F.col("n_hits") / F.col("n_grams")).alias("hit_frac"),
            (F.col("n_hits") / F.col("n_grams") >= threshold).alias("contaminated"),
        )
    )
