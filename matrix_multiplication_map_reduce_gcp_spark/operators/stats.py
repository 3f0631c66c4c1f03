"""Statistical aggregates computed EXACTLY: variance, stddev,
covariance and correlation from decimal power sums.

Built-in stddev/corr accumulate doubles in partition order — not
reproducible across engines or re-partitionings. Deriving them from
exact decimal sums (Σx, Σx², Σxy are associative in decimal) gives
bit-stable results AND is how you'd compute a whole covariance matrix
in one pass at 100 TB anyway (one shuffle of power sums, not one pass
per statistic).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dec
from ..registry import query

# Σ of decimal products stays exact: (12,2)×(12,2) → scale-4 decimals.


@query(
    "stats_price_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           sx / n AS mean_price,
           (sxx - sx * sx / n) / (n - 1) AS var_price,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_price,
           (sxy - sx * sy / n) / (n - 1) AS covar_price_qty,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_price_qty
    FROM s
    """,
)
def stats_price_moments(spark, sf_dir):
    """Mean/var/stddev/covar/corr of price & quantity per return flag,
    all derived from 5 exact decimal power sums in ONE aggregation
    pass (the single-shuffle covariance-matrix shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_extendedprice"), dec("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    var_x = (sxx - sx * sx / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_price"),
        var_x.alias("var_price"),
        F.sqrt(var_x).alias("stddev_price"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_price_qty"),
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("corr_price_qty"),
    )


@query(
    "collect_sorted_aggregates",
    oracle="""
    SELECT n.n_name AS n_name,
           string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segments_csv,
           bit_and(c.c_custkey) AS key_and,
           bit_or(c.c_custkey) AS key_or,
           bit_xor(c.c_custkey) AS key_xor
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def collect_sorted_aggregates(spark, sf_dir):
    """Deterministic collection aggregates: collect_set is unordered,
    so every collected output is sorted before leaving the operator;
    plus integer bitwise aggregates (associative, exact).

    The collected set leaves the operator as a joined STRING, not a
    raw array — nested-type cells canonicalize engine-specifically in
    the driver's value hash (Spark list vs DuckDB VARCHAR[]), and the
    csv form carries identical information portably."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias(
                "segments_csv"
            ),
            F.bit_and("c_custkey").alias("key_and"),
            F.bit_or("c_custkey").alias("key_or"),
            F.bit_xor("c_custkey").alias("key_xor"),
        )
    )


@query(
    "iqr_price_outliers",
    oracle="""
    WITH fences AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY 1),
    flagged AS (
      SELECT o.o_orderpriority, o.o_totalprice, f.q1, f.q3,
             o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
               OR o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1) AS is_outlier
      FROM orders o JOIN fences f USING (o_orderpriority))
    SELECT o_orderpriority, q1, q3,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE is_outlier) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN is_outlier
                         THEN CAST(o_totalprice AS DECIMAL(12,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             AS outlier_value
    FROM flagged
    GROUP BY 1, 2, 3
    """,
)
def iqr_price_outliers(spark, sf_dir):
    """Tukey-fence outlier audit per order priority: exact interpolated
    quartiles (bit-portable across engines, like median_order_price),
    1.5*IQR fences computed with the identical IEEE double arithmetic
    on both sides, outlier mass in exact decimal. Shape: one small
    per-group fence aggregate broadcast back onto the scan — the
    two-pass profile every data-quality monitor runs; no row-level
    state, so it parallelizes at scan bandwidth."""
    o = load_table(spark, sf_dir, "orders")
    fences = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
    )
    flagged = o.join(F.broadcast(fences), "o_orderpriority").withColumn(
        "is_outlier", is_out
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return flagged.groupBy("o_orderpriority", "q1", "q3").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers"),
        F.sum(
            F.when(
                F.col("is_outlier"), F.col("o_totalprice").cast("decimal(12,2)")
            ).otherwise(zero)
        )
        .cast("double")
        .alias("outlier_value"),
    )


@query(
    "winsorized_price_stats",
    oracle="""
    WITH fences AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY 1),
    clamped AS (
      SELECT o.o_orderpriority, f.p05, f.p95,
             LEAST(GREATEST(o.o_totalprice, f.p05), f.p95) AS cp
      FROM orders o JOIN fences f USING (o_orderpriority))
    SELECT o_orderpriority, p05, p95,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(cp AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6)
             AS winsorized_mean
    FROM clamped GROUP BY 1, 2, 3
    """,
)
def winsorized_price_stats(spark, sf_dir):
    """Winsorized (5%-clamped) mean order price per priority — the
    robust-mean companion to iqr_price_outliers: instead of flagging
    tail rows it clamps them to the exact interpolated P05/P95 before
    averaging, so a handful of extreme prices can't move the metric.
    Same two-pass shape: tiny per-group fence aggregate broadcast
    onto the scan; clamped sum in exact decimal."""
    o = load_table(spark, sf_dir, "orders")
    fences = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    cp = F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    return (
        o.join(F.broadcast(fences), "o_orderpriority")
        .withColumn("cp", cp)
        .groupBy("o_orderpriority", "p05", "p95")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("cp").cast("decimal(12,2)")).cast("double")
                / F.count("*"),
                6,
            ).alias("winsorized_mean"),
        )
    )
