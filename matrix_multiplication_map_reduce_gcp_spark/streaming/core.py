"""Streaming source + sink helpers.

The stream source reads the events fixture with the same
schema-adaptive ts normalization as the batch catalog (nanos-as-long
or native micros), so streaming and batch results are comparable.
"""

from __future__ import annotations

import contextlib
import itertools

from pyspark.sql import DataFrame, SparkSession

_SINK_IDS = itertools.count()


@contextlib.contextmanager
def small_shuffle(spark: SparkSession, n: int = 8):
    """Run the enclosed streaming query with a small shuffle-partition
    count, restoring the session value afterwards.

    Stateful streaming pays a fixed per-partition state-store cost
    every micro-batch (and AQE is disabled in streaming, so the
    session's shuffle.partitions applies verbatim) — so streams over
    the test fixtures run with a partition count sized for them.
    Results are exact aggregates, unaffected by partitioning. Shared
    by every stream driver (memory sink + foreachBatch sinks) so the
    save/set/restore discipline lives in one place."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _stream_dir(sf_dir: str, table: str = "events") -> str:
    """The file stream source needs a DIRECTORY of files; stage a
    symlink to the fixture parquet under a per-(sf, table) temp dir.
    One directory per TABLE — readStream.parquet() consumes every
    file in the directory, so mixing tables in one dir would feed a
    stream rows from the wrong schema."""
    import hashlib
    import os

    d = (
        f"/tmp/spark_graft_streams/"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}/{table}"
    )
    os.makedirs(d, exist_ok=True)
    link = f"{d}/{table}.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/{table}.parquet", link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as an unbounded stream (file source; schema pinned
    from the batch read — required for readStream)."""
    from ..catalog import ensure_nanos_conf, load_table, normalize_events_ts

    ensure_nanos_conf(spark)
    schema = load_table(spark, sf_dir, "events").schema
    raw = spark.readStream.schema(schema).parquet(_stream_dir(sf_dir))
    return normalize_events_ts(raw)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`documents` as an unbounded stream — the ingest-time source for
    the multimodal decode-at-ingest pipeline."""
    from ..catalog import load_table

    schema = load_table(spark, sf_dir, "documents").schema
    return spark.readStream.schema(schema).parquet(
        _stream_dir(sf_dir, "documents")
    )


def run_to_table(stream_df: DataFrame, spark: SparkSession, output_mode: str) -> DataFrame:
    """Drive a streaming query to completion (availableNow) into a
    memory sink; return the sink contents as a batch DataFrame.
    Runs under :func:`small_shuffle` (see its docstring)."""
    name = f"stream_sink_{next(_SINK_IDS)}"
    with small_shuffle(spark):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
