"""Connector gates, small-file compaction, corrupt-record ingestion."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.sources.connectors import (
    ConnectorUnavailable,
    read_delta,
    read_iceberg,
    read_kafka_stream,
)
from matrix_multiplication_map_reduce_gcp_spark.sources.maintenance import compact_parquet

from .conftest import SF_SMOKE


def test_connector_gates_raise_actionable_errors(spark):
    with pytest.raises(ConnectorUnavailable, match="Delta Lake.*delta-spark"):
        read_delta(spark, "/tmp/nowhere")
    with pytest.raises(ConnectorUnavailable, match="Iceberg.*iceberg-spark-runtime"):
        read_iceberg(spark, "db.tbl")
    with pytest.raises(ConnectorUnavailable, match="Kafka.*spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "t")


def test_compaction_reduces_file_count(spark, tmp_path):
    # fragment lineitem into many small files
    src = str(tmp_path / "fragmented")
    li = load_table(spark, SF_SMOKE, "lineitem")
    li.repartition(37).write.parquet(src)
    n_src = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_src == 37

    dst = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
    assert n_out < n_src
    # missing source raises instead of silently collapsing to 1 file
    with pytest.raises(FileNotFoundError):
        compact_parquet(spark, str(tmp_path / "nope"), dst)
    # content preserved exactly (multiset compare — the synthetic
    # lineitem has no unique key to sort on)
    assert sorted(map(tuple, spark.read.parquet(dst).collect())) == sorted(
        map(tuple, li.collect())
    )


def test_corrupt_json_records_quarantined(spark, tmp_path):
    """PERMISSIVE ingestion: malformed rows land in _corrupt_record
    instead of failing the job — the 100 TB ingest posture (one bad
    row must not kill a million-file load)."""
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": 1, "v": 10.0}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 20.0}\n'
        '{"id": "oops", "v": "also-bad"}\n'
    )
    schema = "id long, v double, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r.id for r in good.collect()} == {1, 2}
    assert bad.count() == 2  # the garbage line and the type-mismatched row
