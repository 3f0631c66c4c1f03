"""Bucketed co-located joins: bucketBy at write time lets later joins
on the bucket key skip the shuffle entirely — the repeat-join
optimization for 100 TB fact tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # saveAsTable writes to the session's spark-warehouse dir (static
    # conf — can't be redirected per-test; dir is gitignored).
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, lineitem_b = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = orders_b.join(
            lineitem_b, orders_b.o_orderkey == lineitem_b.l_orderkey
        ).groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: the JOIN inputs need no Exchange (the one
        # remaining Exchange is the final tiny groupBy)
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # correctness unchanged
        want = (
            load_table(spark, SF_SMOKE, "orders")
            .join(
                load_table(spark, SF_SMOKE, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ivf_cell_partitioned_index_prunes(spark, tmp_path):
    """The 100 TB IVF-PQ deployment shape (SCALING.md): the code index
    is written PARTITIONED BY cell, so probing nprobe cells reads only
    those cells' files — partition pruning at the source, proven here
    physically via inputFiles(), not just plan text."""
    from matrix_multiplication_map_reduce_gcp_spark.similarity.ivf import assign_cells
    from matrix_multiplication_map_reduce_gcp_spark.similarity.pq import pq_codes

    e = load_table(spark, SF_SMOKE, "embeddings")
    index = pq_codes(e).join(assign_cells(e).select("vec_id", "cell"), "vec_id")
    path = str(tmp_path / "ivfpq_index")
    index.write.partitionBy("cell").parquet(path)

    probe = spark.read.parquet(path).filter(F.col("cell").isin(3, 7))
    # inputFiles() reflects the PRE-pruning file index; input_file_name()
    # is stamped at execution, so it lists exactly the files the pruned
    # scan actually touched.
    files = [
        r.f
        for r in probe.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files, "probe read no files"
    assert all("cell=3" in f or "cell=7" in f for f in files), (
        f"cell probe touched files outside its partitions: {files}"
    )
    # And the pruned read still returns exactly the right rows.
    full = spark.read.parquet(path)
    assert probe.count() == full.filter(F.col("cell").isin(3, 7)).count() > 0
