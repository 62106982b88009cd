"""Property-based tests: the composed join operators (as-of via
union+running-last, range via bucket binning) must agree with naive
brute-force reference implementations on randomized inputs — the
same differential strategy SURVEY.md §5 uses for the text kernels.

Examples are kept small (Spark jobs per example); the value is in the
randomized shapes — empty sides, duplicate keys, boundary timestamps,
interval overlaps and zero-width intervals.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=20)

FACTS = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12)
RIGHTS = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=8)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(facts=FACTS, rights=RIGHTS)
@_SETTINGS
def test_asof_join_matches_naive(spark, facts, rights):
    from wikiextractor_spark.operators.asof import asof_join

    # unique (key, ts) on the right — the operator's documented contract
    rights = sorted({(k, ts) for k, ts in rights})
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(facts)] or [(None, None, None)],
        "fid long, k long, ts long",
    ).filter("fid IS NOT NULL")
    right = spark.createDataFrame(
        [(k, ts, k * 100 + ts) for k, ts in rights] or [(None, None, None)],
        "k long, ts long, v long",
    ).filter("k IS NOT NULL")

    got = {
        (r["fid"], r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, on="k", how="left").collect()
    }
    want = set()
    for i, (k, ts) in enumerate(facts):
        cands = [(rts, k * 100 + rts) for rk, rts in rights if rk == k and rts <= ts]
        if cands:
            rts, v = max(cands)
            want.add((i, rts, v))
        else:
            want.add((i, None, None))
    assert got == want


INTERVALS = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 10)), min_size=0, max_size=6
)
POINTS = st.lists(st.integers(min_value=-2, max_value=30), min_size=0, max_size=12)
WIDTHS = st.sampled_from([1.0, 2.5, 7.0])


@given(points=POINTS, intervals=INTERVALS, width=WIDTHS)
@_SETTINGS
def test_range_join_matches_naive(spark, points, intervals, width):
    from wikiextractor_spark.operators.rangejoin import range_join

    ivs = [(i, float(lo), float(lo + length)) for i, (lo, length) in enumerate(intervals)]
    pts = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(points)] or [(None, None)],
        "pid long, x double",
    ).filter("pid IS NOT NULL")
    iv_df = spark.createDataFrame(
        ivs or [(None, None, None)], "iid long, lo double, hi double"
    ).filter("iid IS NOT NULL")

    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, iv_df, "x", bucket_width=width).collect()
    }
    want = {
        (pi, ii)
        for pi, x in enumerate(points)
        for ii, lo, hi in ivs
        if lo <= x < hi
    }
    assert got == want


WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=1, max_size=24,
)


@given(words=WORDS, chunk=st.sampled_from([4, 8]), overlap=st.sampled_from([0, 2]))
@_SETTINGS
def test_chunking_reassembles_to_original(spark, words, chunk, overlap):
    """Dropping each chunk's leading `overlap` tokens (except chunk 0)
    and concatenating must reproduce the original token stream, and
    every n_tokens must equal the chunk's real token count."""
    from wikiextractor_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        (r["chunk_no"], r["chunk"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    )
    rebuilt = []
    for no, text, n_tok in rows:
        toks = text.split(" ")
        assert n_tok == len(toks)
        rebuilt.extend(toks if no == 0 else toks[overlap:])
    assert rebuilt == words


@given(words=st.permutations(["a", "bb", "ccc", "dd", "e", "ff", "g", "hh"]))
@_SETTINGS
def test_simhash_is_word_order_invariant(spark, words):
    """SimHash is a bag-of-words signature: permuting words must not
    change it (the property LSH blocks rely on)."""
    from wikiextractor_spark.operators.dedup import simhash32

    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a bb ccc dd e ff g hh")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash32(df).collect()}
    assert sigs[1] == sigs[2]


def test_asof_bucketed_equals_plain_at_sf01(spark):
    """r4 advice #7: the bucketed as-of (hot-key mitigation) must be
    value-equal to the plain union+running-last as-of at sf0.1 size
    under AQE — not just on the small randomized examples above."""
    from pyspark.sql import functions as F

    from wikiextractor_spark.operators.asof import asof_join, asof_join_bucketed
    from wikiextractor_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("sig_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )

    def canon(df):
        return sorted(
            (r["event_id"], r["asof_ts"], r["asof_sig_value"])
            for r in df.select("event_id", "asof_ts", "asof_sig_value").collect()
        )

    plain = canon(asof_join(purchases, signups, on="user_id"))
    bucketed = canon(
        asof_join_bucketed(purchases, signups, on="user_id")
    )
    assert len(plain) > 1000
    assert plain == bucketed


def test_salted_join_equals_plain_at_sf01(spark):
    """r4 advice #7: salted_join must be row-for-row equal to the
    plain equi-join on real sf0.1 tables under AQE (salt only routes,
    never changes results) — for both inner and left joins, including
    unmatched left rows."""
    from pyspark.sql import functions as F

    from wikiextractor_spark.operators.skew import salted_join

    li = (
        spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(
            F.col("l_orderkey"), F.col("l_partkey").alias("pk"),
            F.col("l_quantity"),
        )
    )
    # drop a slice of parts so the left join exercises unmatched rows
    part = (
        spark.read.parquet("/root/testdata/sf0.1/part.parquet")
        .filter(F.col("p_partkey") % 10 != 0)
        .select(F.col("p_partkey").alias("pk"), F.col("p_brand"))
    )

    def canon(df):
        return sorted(
            (r["l_orderkey"], r["pk"], str(r["l_quantity"]), r["p_brand"])
            for r in df.collect()
        )

    for how in ("inner", "left"):
        plain = canon(li.join(part, "pk", how))
        salted = canon(salted_join(li, part, on="pk", buckets=8, how=how))
        assert len(plain) > 10_000
        assert plain == salted
