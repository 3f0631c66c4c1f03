"""Sources & sinks: format round-trips, save modes, partitioned
layout + partition pruning, and the approx-aggregate error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.plans.explain import executed_plan
from matrix_multiplication_map_reduce_gcp_spark.sources import read_any, write_any

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF_SMOKE, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_roundtrip_formats(spark, nation, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("io") / f"nation_{fmt}")
    write_any(nation, path, fmt=fmt)
    back = read_any(spark, path, fmt=fmt, schema=nation.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_schema_required_for_textual_formats(spark):
    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, "/tmp/nowhere", fmt="json")


def test_save_modes(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "modes")
    write_any(nation, path, mode="overwrite")
    write_any(nation, path, mode="append")
    assert read_any(spark, path).count() == 2 * nation.count()
    with pytest.raises(Exception, match="already exists|ErrorIfExists|PATH_ALREADY_EXISTS"):
        write_any(nation, path, mode="error")


def test_partitioned_write_prunes(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "orders_by_status")
    orders = load_table(spark, SF_SMOKE, "orders")
    write_any(orders, path, partition_by=["o_orderstatus"])
    scan = read_any(spark, path).filter(F.col("o_orderstatus") == "F")
    assert scan.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    # partition pruning: the scan's PartitionFilters carry the predicate
    assert "o_orderstatus" in executed_plan(scan).split("PartitionFilters")[1][:200]


def test_file_scheme_uri_roundtrip(spark, nation, tmp_path_factory):
    """Explicit file:// URIs go through Hadoop's FileSystem resolution
    — the same code path an s3a://, gs://, or hdfs:// URI takes (only
    the scheme→FileSystem binding differs), so scheme-qualified paths
    must behave identically to bare ones, including partitioned
    layouts and pruning."""
    base = tmp_path_factory.mktemp("io") / "nation_uri"
    uri = f"file://{base}"
    write_any(nation, uri, partition_by=["n_regionkey"])
    back = read_any(spark, uri)
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )
    pruned = back.filter(F.col("n_regionkey") == 0)
    assert "n_regionkey" in executed_plan(pruned).split("PartitionFilters")[1][:200]
    # scheme-qualified and bare spellings resolve to the same data
    assert read_any(spark, str(base)).count() == nation.count()


def test_glob_and_multipath_reads(spark, nation, tmp_path_factory):
    """Object-store ingest patterns: glob paths and explicit
    multi-path loads (daily partition folders at 100 TB)."""
    root = tmp_path_factory.mktemp("io")
    for d in ("day=01", "day=02"):
        write_any(nation.drop("n_comment"), str(root / "glob" / d))
    globbed = read_any(spark, str(root / "glob" / "day=*"))
    assert globbed.count() == 2 * nation.count()
    two = spark.read.parquet(str(root / "glob" / "day=01"), str(root / "glob" / "day=02"))
    assert two.count() == 2 * nation.count()


def test_approx_aggregates_within_tolerance(spark):
    from matrix_multiplication_map_reduce_gcp_spark import registry

    q = registry.load_all()
    for r in q["approx_distinct_counts"].fn(spark, SF_SMOKE).collect():
        assert r.within_tolerance and r.exact_customers > 0
    for r in q["approx_quantiles"].fn(spark, SF_SMOKE).collect():
        assert r.within_tolerance and r.exact_median > 0


def test_matrixgen_python_datasource(spark):
    """PySpark 4 custom Python DataSource: source-planned partitions,
    re-read determinism (lineage replay safety), and cell values equal
    to the md5 replica."""
    from matrix_multiplication_map_reduce_gcp_spark.sources.matrixgen import (
        gen_value,
        register_matrixgen,
    )

    register_matrixgen(spark)
    register_matrixgen(spark)  # idempotent
    df = (
        spark.read.format("matrixgen")
        .option("n", 8)
        .option("seed", 3)
        .option("partitions", 3)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = sorted((r.i, r.j, r.v) for r in df.collect())
    assert len(rows) == 64
    assert rows == [(i, j, gen_value(3, i, j)) for i in range(8) for j in range(8)]
    again = sorted((r.i, r.j, r.v) for r in df.collect())
    assert again == rows
