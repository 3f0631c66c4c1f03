"""Partitioning-invariance: the float-producing queries must return
IDENTICAL values under different shuffle-partition counts — the
property that makes them stable under AQE re-planning on a cluster
(and hash-matchable against any oracle). A raw double SUM would fail
this test; the decimal/fold discipline passes it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark import registry

from .conftest import SF_SMOKE

FLOAT_HEAVY = [
    "matmul",
    "pricing_summary",
    "customer_running_spend",
    "ann_brute_force_topk",
    "sql_cte_window_share",
    "power_iteration_2step",
    # r4 float-emitting additions: nano-integer disciplines (KL, LM,
    # chi-square), hash-keyed float ordering (weighted sample), and
    # integer-ratio lift — each must hold bit-identical under AQE-like
    # re-partitioning.
    "lang_mixture_kl",
    "lm_bigram_quality_scores",
    "chi_square_contingency",
    "weighted_sample_orders",
    "market_basket_pairs",
    # r4 second-wave float emitters: broadcast-model log-ratio scoring
    # (DSIR), within-source percent_rank calibration, decimal-summed
    # attribution, integer-ratio histogram fractions.
    "dsir_importance_weights",
    "quality_percentile_calibration",
    "attribution_last_touch",
    "equi_width_price_histogram",
    "join_view_ivm",
    "shuffle_skew_report",
    "knn_graph_lsh",
    "embedding_prototypicality",
    "ann_recall_report",
    # r5 additions: the epoch manifest's order-independent checksum
    # (its whole claim is partitioning-stability), the source-sketch
    # n/k estimate, and the k-core peel loop (window rank + iterated
    # semi-joins must not depend on the physical layout).
    "epoch_shuffle_shards",
    "source_minhash_similarity",
    "k_core_suppliers",
    "leakage_safe_split",
]


@pytest.mark.parametrize("name", FLOAT_HEAVY)
def test_same_values_across_partitionings(spark, name):
    qd = registry.load_all()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows_a = sorted(map(tuple, qd.fn(spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        rows_b = sorted(map(tuple, qd.fn(spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert rows_a == rows_b  # exact, including every float bit


def test_repartitioned_input_same_result(spark):
    """Even with the fact table pre-shuffled into a hostile layout the
    flagship produces identical bits."""
    qd = registry.load_all()["matmul"]
    base = sorted(map(tuple, qd.fn(spark, SF_SMOKE).collect()))

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").repartition(13, "l_suppkey")
    from matrix_multiplication_map_reduce_gcp_spark.matrix.coo import CooMatrix

    a = (
        li.groupBy((F.col("l_orderkey") % 40).alias("i"), (F.col("l_partkey") % 60).alias("j"))
        .agg(F.count("*").cast("double").alias("v"))
    )
    b = (
        li.groupBy((F.col("l_partkey") % 60).alias("j2"), (F.col("l_suppkey") % 30).alias("k"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(22,2)")).cast("double").alias("v"))
        .select(F.col("j2").alias("i"), F.col("k").alias("j"), "v")
    )
    got = sorted(
        map(tuple, CooMatrix(a, 40, 60).multiply(CooMatrix(b, 60, 30)).df.collect())
    )
    assert got == base
