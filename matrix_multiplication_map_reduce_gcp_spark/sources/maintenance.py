"""Table-maintenance utilities: small-file compaction.

At 100 TB the silent killer is millions of small files from
fine-grained ingestion — every scan pays per-file open cost and the
driver pays listing cost. `compact_parquet` rewrites a directory to
~target-sized files (coalesce, no shuffle) or exact file count with
even sizes (repartition)."""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


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
    n_files = max(1, math.ceil(dir_bytes(src) / target_file_bytes))
    df = spark.read.parquet(src)
    df = df.repartition(n_files) if exact else df.coalesce(n_files)
    df.write.mode("overwrite").parquet(dst)
    return sum(
        1 for f in os.listdir(dst) if f.endswith(".parquet")
    )
