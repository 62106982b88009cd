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
