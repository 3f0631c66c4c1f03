"""Observability surfaces: df.observe() inline metrics and CBO table
statistics (ANALYZE TABLE) feeding the optimizer."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.functions.exact import dec

from .conftest import SF_SMOKE


def test_observe_inline_metrics(spark):
    """observe() collects exact metrics as a side effect of the main
    action — one pass for the query AND its data-quality counters (the
    pattern for pipeline monitoring without double scans)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    obs = Observation("li_metrics")
    out = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue_seen"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("high_discount"),
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    result_rows = sum(r.n for r in out.collect())
    m = obs.get
    assert m["rows_seen"] == result_rows == li.count()
    assert m["high_discount"] > 0
    assert m["revenue_seen"] > 0


def test_analyze_table_stats_reach_optimizer(spark):
    """ANALYZE TABLE COMPUTE STATISTICS: row/size stats must appear in
    the optimized plan (what CBO join reordering keys off)."""
    load_table(spark, SF_SMOKE, "nation").write.mode("overwrite").saveAsTable(
        "nation_stats"
    )
    try:
        spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS")
        stats = spark.sql("DESCRIBE EXTENDED nation_stats").filter(
            F.col("col_name") == "Statistics"
        ).collect()
        assert stats and "25 rows" in stats[0]["data_type"]
        # without spark.sql.cbo.enabled the plan carries sizeInBytes
        # (which AQE/broadcast decisions use); rowCount needs CBO on
        plan = (
            spark.table("nation_stats")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .toString()
        )
        assert "sizeInBytes=" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_stats")
