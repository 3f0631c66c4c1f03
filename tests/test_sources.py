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


def test_approx_aggregates_within_tolerance(spark):
    from matrix_multiplication_map_reduce_gcp_spark import registry

    q = registry.load_all()
    for r in q["approx_distinct_counts"].fn(spark, SF_SMOKE).collect():
        assert r.within_tolerance and r.exact_customers > 0
    for r in q["approx_quantiles"].fn(spark, SF_SMOKE).collect():
        assert r.within_tolerance and r.exact_median > 0
