"""Size-targeted parquet layout writer: sizing, row-group bounds,
range clustering, and edge cases."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from wikiextractor_spark.sink import write_sized_parquet


def _part_files(d: str) -> list[str]:
    return sorted(glob.glob(f"{d}/*.parquet"))


def test_sizing_and_row_groups(spark, tmp_path):
    out = str(tmp_path / "li")
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    n = write_sized_parquet(li, out, target_file_mb=1, row_group_mb=1)
    files = _part_files(out)
    assert len(files) == n >= 2
    # every file lands at or under ~1.5x target (estimate errs small)
    for f in files:
        assert os.path.getsize(f) <= 1.5 * 1024 * 1024
    # round trip exact
    assert spark.read.parquet(out).count() == li.count()


def test_range_clustering_disjoint(spark, tmp_path):
    out = str(tmp_path / "sorted")
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    write_sized_parquet(li, out, target_file_mb=1, row_group_mb=1,
                        sort_by="l_orderkey")
    files = _part_files(out)
    assert len(files) >= 2
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = [c for c in range(md.num_columns)
               if md.row_group(0).column(c).path_in_schema == "l_orderkey"][0]
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    # consecutive files never interleave key ranges → min/max stats
    # prune whole files for range predicates
    assert all(a[1] <= b[0] for a, b in zip(ranges, ranges[1:]))


def test_empty_dataframe(spark, tmp_path):
    out = str(tmp_path / "empty")
    df = spark.range(0).selectExpr("id AS doc_id", "CAST(id AS STRING) AS text")
    n = write_sized_parquet(df, out, target_file_mb=1)
    assert n == 1
    assert spark.read.parquet(out).count() == 0


def test_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        write_sized_parquet(df, "/tmp/x", target_file_mb=0)


# --------------------------------------------------------------------------
# JSONL shard export (sink.write_jsonl_shards)
# --------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    ArrayType, LongType, StringType, StructField, StructType,
)

from wikiextractor_spark.sink import (  # noqa: E402
    read_jsonl_shards,
    read_training_shards,
    write_jsonl_shards,
    write_training_shards,
)

_JL_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("token_ids", ArrayType(LongType())),
])


def _jl_src(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}", [i, i + 1, i + 2]) for i in range(40)],
        _JL_SCHEMA,
    )


def test_jsonl_shards_round_trip_and_contract(spark, tmp_path):
    src = _jl_src(spark)
    d = str(tmp_path / "jl")
    assert write_jsonl_shards(src, d, n_shards=4, seed="ep0") == 4
    back = read_jsonl_shards(spark, d, _JL_SCHEMA)
    rows = back.collect()
    assert len(rows) == 40
    # content lossless incl. the array column
    got = {r["doc_id"]: (r["text"], list(r["token_ids"])) for r in rows}
    assert got[7] == ("doc 7", [7, 8, 9])
    # shard membership is the (id, seed) pmod contract
    exp = {
        r["doc_id"]: r["sid"]
        for r in src.select(
            "doc_id",
            F.pmod(
                F.xxhash64(F.col("doc_id").cast("string"), F.lit("ep0")),
                F.lit(4),
            ).cast("int").alias("sid"),
        ).collect()
    }
    for r in rows:
        assert r["shard_id"] == exp[r["doc_id"]], r["doc_id"]


def test_jsonl_parity_with_parquet_shards(spark, tmp_path):
    """Same (id, seed) → identical membership AND within-shard order
    across the two formats — swap formats without re-deriving."""
    src = _jl_src(spark)
    dj, dp = str(tmp_path / "j"), str(tmp_path / "p")
    write_jsonl_shards(src, dj, n_shards=3, seed="s")
    write_training_shards(src, dp, n_shards=3, seed="s")
    jl = read_jsonl_shards(spark, dj, _JL_SCHEMA)
    pq = read_training_shards(spark, dp)
    for sid in range(3):
        a = [r["doc_id"] for r in jl.where(F.col("shard_id") == sid)
             .collect()]
        b = [r["doc_id"] for r in pq.where(F.col("shard_id") == sid)
             .collect()]
        assert a == b, sid


def test_jsonl_shards_subset_and_options(spark, tmp_path):
    src = _jl_src(spark)
    d = str(tmp_path / "jz")
    write_jsonl_shards(src, d, n_shards=4, seed="x",
                       compression="gzip")
    import glob

    assert glob.glob(f"{d}/shard_id=*/*.gz")  # compression applied
    two = read_jsonl_shards(spark, d, _JL_SCHEMA, shard_ids=[1, 3])
    assert set(
        r["shard_id"] for r in two.select("shard_id").distinct().collect()
    ) == {1, 3}
    # a listing matching NOTHING raises (the parquet sink's
    # silent-data-loss guard, mirrored — r13 review)
    with pytest.raises(ValueError, match="no matching shard"):
        read_jsonl_shards(spark, d, _JL_SCHEMA, shard_ids=[99])
    with pytest.raises(ValueError, match="no matching shard"):
        read_jsonl_shards(spark, str(tmp_path / "nope_typo"),
                          _JL_SCHEMA)
    with pytest.raises(ValueError, match="n_shards"):
        write_jsonl_shards(src, str(tmp_path / "bad"), n_shards=0)


def test_shard_tiebreak_stabilizes_nonunique_ids(spark, tmp_path):
    """With a repeated id_col, (id) alone ties the whole sort key;
    tiebreak_cols completes it, making the two formats' within-shard
    order identical and reruns byte-stable."""
    rows = [(i // 4, i % 4, f"c{i}") for i in range(64)]
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("chunk_no", LongType()),
        StructField("chunk", StringType()),
    ])
    src = spark.createDataFrame(rows, schema).repartition(7)
    dj, dp = str(tmp_path / "tj"), str(tmp_path / "tp")
    write_jsonl_shards(src, dj, n_shards=3, seed="s",
                       tiebreak_cols=("chunk_no",))
    write_training_shards(src, dp, n_shards=3, seed="s",
                          tiebreak_cols=("chunk_no",))
    jl = read_jsonl_shards(spark, dj, schema)
    pq = read_training_shards(spark, dp)
    for sid in range(3):
        a = [(r["doc_id"], r["chunk_no"])
             for r in jl.where(F.col("shard_id") == sid).collect()]
        b = [(r["doc_id"], r["chunk_no"])
             for r in pq.where(F.col("shard_id") == sid).collect()]
        assert a == b, sid
        # within a doc, chunks come back in chunk order
        by_doc = {}
        for d_, c_ in a:
            by_doc.setdefault(d_, []).append(c_)
        for cs in by_doc.values():
            assert cs == sorted(cs)


# --------------------------------------------------------------------------
# shard integrity manifests
# --------------------------------------------------------------------------

from wikiextractor_spark.sink import (  # noqa: E402
    shard_manifest,
    verify_training_shards,
    write_shard_manifest,
)


def test_manifest_round_trip_and_corruption(spark, tmp_path):
    import glob
    import shutil

    src = _jl_src(spark)
    d = str(tmp_path / "ms")
    write_training_shards(src, d, n_shards=4, seed="m")
    back = read_training_shards(spark, d)
    write_shard_manifest(back, d)
    # clean layout verifies; the manifest file must not pollute reads
    assert verify_training_shards(spark, d) == 4
    assert read_training_shards(spark, d).count() == 40
    # order-insensitivity: the checksum ignores scan order
    m1 = {tuple(r) for r in shard_manifest(back).collect()}
    m2 = {
        tuple(r)
        for r in shard_manifest(back.repartition(7)).collect()
    }
    assert m1 == m2
    # corruption: drop one shard directory entirely -> loud failure
    victim = sorted(glob.glob(f"{d}/shard_id=*"))[0]
    shutil.rmtree(victim)
    with pytest.raises(ValueError, match="MISSING from the layout"):
        verify_training_shards(spark, d)


def test_manifest_detects_content_drift(spark, tmp_path):
    import glob

    src = _jl_src(spark)
    d = str(tmp_path / "md")
    write_training_shards(src, d, n_shards=2, seed="m")
    write_shard_manifest(read_training_shards(spark, d), d)
    # rewrite one shard with one row altered (same count) —
    # materialize BEFORE overwriting, or the lazy plan reads the
    # very files the write replaces
    rows = [
        r.asDict()
        for r in read_training_shards(spark, d, shard_ids=[0])
        .drop("shard_id").collect()
    ]
    rows[0]["text"] = "tampered"
    drift = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["token_ids"]) for r in rows],
        _JL_SCHEMA,
    )
    part_dir = glob.glob(f"{d}/shard_id=0")[0]
    drift.coalesce(1).write.mode("overwrite").parquet(part_dir)
    with pytest.raises(ValueError, match="shard 0: manifest"):
        verify_training_shards(spark, d)


def test_manifest_missing_raises(spark, tmp_path):
    src = _jl_src(spark)
    d = str(tmp_path / "mn")
    write_training_shards(src, d, n_shards=2, seed="m")
    with pytest.raises(ValueError, match="no manifest under"):
        verify_training_shards(spark, d)


def test_manifest_present_but_unreadable_propagates(spark, tmp_path):
    """A _manifest directory that EXISTS but cannot be read (emptied —
    partial data loss, exactly the event the gate exists to surface)
    must propagate its AnalysisException, NOT get the 'write one'
    bootstrap advice (r13 ADVICE: advising a regenerate there
    launders a loss signal into a bootstrap hint)."""
    import os

    from pyspark.errors import AnalysisException

    src = _jl_src(spark)
    d = str(tmp_path / "mu")
    write_training_shards(src, d, n_shards=2, seed="m")
    os.makedirs(f"{d}/_manifest")  # present, no parquet inside
    with pytest.raises(AnalysisException) as ei:
        verify_training_shards(spark, d)
    assert "write one" not in str(ei.value)


def test_jsonl_manifest_round_trip_and_corruption(spark, tmp_path):
    """The interchange layout's own integrity gate (r14, r13 VERDICT
    What's-missing #3): manifest from the schema'd JSONL read-back,
    verification recomputes over the bytes on disk; tamper and loss
    fail loudly."""
    import shutil

    src = _jl_src(spark)
    d = str(tmp_path / "jm")
    n = write_jsonl_shards(src, d, n_shards=4, seed="m")
    back = read_jsonl_shards(spark, d, _JL_SCHEMA)
    write_shard_manifest(back, d)
    assert verify_training_shards(
        spark, d, fmt="jsonl", schema=_JL_SCHEMA
    ) == n
    # the manifest must not pollute the shard listing
    assert read_jsonl_shards(spark, d, _JL_SCHEMA).count() == 40
    # content drift: tamper one value inside one shard's json bytes.
    # Drop the local-FS .crc sidecar first — on a checksumming local
    # FS Hadoop's own CRC trips before the manifest gate can (also a
    # loud failure, but here we exercise the MANIFEST's detection,
    # the only gate an object store without sidecars gives you)
    victim = sorted(glob.glob(f"{d}/shard_id=0/*.json"))[0]
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    with open(victim) as f:
        body = f.read()
    assert "doc " in body
    with open(victim, "w") as f:
        f.write(body.replace("doc ", "tampered ", 1))
    with pytest.raises(ValueError, match="shard 0: manifest"):
        verify_training_shards(spark, d, fmt="jsonl", schema=_JL_SCHEMA)
    # loss: a whole shard directory gone
    shutil.rmtree(f"{d}/shard_id=0")
    with pytest.raises(ValueError, match="MISSING from the layout"):
        verify_training_shards(spark, d, fmt="jsonl", schema=_JL_SCHEMA)


def test_manifest_format_contract_errors(spark, tmp_path):
    src = _jl_src(spark)
    d = str(tmp_path / "mc")
    write_training_shards(src, d, n_shards=2, seed="m")
    write_shard_manifest(read_training_shards(spark, d), d)
    with pytest.raises(ValueError, match="fmt must be"):
        verify_training_shards(spark, d, fmt="csv")
    with pytest.raises(ValueError, match="needs the export schema"):
        verify_training_shards(spark, d, fmt="jsonl")
    with pytest.raises(ValueError, match="applies only to"):
        verify_training_shards(spark, d, schema=_JL_SCHEMA)
