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
