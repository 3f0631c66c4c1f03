"""Table-maintenance utilities: small-file compaction.

At 100 TB the silent killer is millions of small files from
fine-grained ingestion — every scan pays per-file open cost and the
driver pays listing cost. `compact_parquet` rewrites a directory to
~target-sized files (coalesce, no shuffle) or exact file count with
even sizes (repartition).

Sizing goes through the Hadoop FileSystem API, so any scheme the
session can read (file://, hdfs://, s3a://, gs://) is sized correctly
and a missing path raises instead of silently collapsing the dataset
to one file.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from .io import read_any, write_any


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under `path` on whatever filesystem it lives on.
    Raises FileNotFoundError for nonexistent paths."""
    fs, p = _hadoop_path(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    return fs.getContentSummary(p).getLength()


def parquet_file_count(spark: SparkSession, path: str) -> int:
    fs, p = _hadoop_path(spark, path)
    return sum(
        1
        for st in fs.listStatus(p)
        if st.getPath().getName().endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    exact: bool = False,
) -> int:
    """Rewrite `src` parquet dir into `dst` with ~target-sized files.
    Returns the output file count. `exact=False` uses coalesce (no
    shuffle — may be uneven); True uses repartition (one shuffle —
    even sizes)."""
    total = dir_bytes(spark, src)
    if total == 0:
        raise ValueError(f"refusing to compact empty/unreadable source: {src}")
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = read_any(spark, src)
    df = df.repartition(n_files) if exact else df.coalesce(n_files)
    write_any(df, dst, mode="overwrite")
    return parquet_file_count(spark, dst)
