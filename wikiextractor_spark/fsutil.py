"""Driver-side Hadoop-FS helpers shared by the partitioned stores
(streaming signature store, persisted IVF index).

Explicit directory listing — the same work any FileIndex does — lets
a reader hand Spark ONLY matching hive partition directories, so scan
bounds never depend on the optimizer pruning anything.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(Path, FileSystem) for ``path`` via the JVM gateway."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def hive_partition_dirs(
    spark: SparkSession, glob: str, key: str,
) -> list[tuple[str, str]]:
    """Glob for ``key=<value>`` hive partition directories and return
    ``(value, path)`` pairs.  Directories whose final component is not
    ``key=...`` (including ``__HIVE_DEFAULT_PARTITION__`` or foreign
    files) are skipped rather than crashing the listing."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(glob)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.globStatus(jpath) or []:
        name = st.getPath().getName()
        if not name.startswith(f"{key}=") or not st.isDirectory():
            continue
        out.append((name.split("=", 1)[1], st.getPath().toString()))
    return out


def int_partition_dirs(
    spark: SparkSession, glob: str, key: str,
) -> list[tuple[int, str]]:
    """:func:`hive_partition_dirs` keeping only integer-valued
    partitions (non-numeric values skipped, not crashed on —
    including values isdigit() accepts but int() rejects, like
    superscripts or double signs)."""
    out = []
    for v, p in hive_partition_dirs(spark, glob, key):
        try:
            out.append((int(v), p))
        except ValueError:
            continue
    return out
