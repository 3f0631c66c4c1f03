"""Approximate aggregates: HyperLogLog++ distinct counts and
approximate quantiles. These are deterministic within Spark but their
sketch algorithms differ from DuckDB's, so no SQL oracle exists — the
driver records a rows-only check and tests/test_approx.py bounds the
error against the exact answers instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query("approx_distinct_counts", oracle=None)
def approx_distinct_counts(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd 5%) per order status — the
    one-pass no-shuffle-of-distinct-values sketch you actually run at
    100 TB, next to the exact count for comparison at test scale."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


@query("approx_quantiles", oracle=None)
def approx_quantiles(spark, sf_dir):
    """percentile_approx (GK sketch) vs the exact percentile, per
    order priority."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_median"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
    )
