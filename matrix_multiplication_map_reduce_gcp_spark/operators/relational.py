"""Relational operator surface: scans, projection/filter, every join
type, aggregation (incl. rollup/cube/grouping sets), having, distinct,
pivot, subqueries, sort/limit/top-k.

The reference had exactly one hand-rolled equi-join + one aggregate
(reference reducer/main.py:20-32) and implicit projection via array
slicing (orchestrator/main.py:90,103) — SURVEY.md §2.3 maps each
missing category to the Spark primitive used here.

Scale discipline:
- filters/projections expressed declaratively → parquet pushdown;
- dimension tables broadcast (region/nation/supplier/part stay small
  at any SF — catalog.BROADCAST_TABLES);
- top-k = orderBy+limit (Spark plans TakeOrderedAndProject — no full
  sort at scale);
- money aggregates in decimal for order-independent exactness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dec, dsum, sql_dsum
from ..registry import query


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS STRING) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical scan→filter→agg pipeline."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount"))
    charge = disc_price * (1 + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE) AS revenue,
           o.o_orderdate AS o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "region_nation_revenue",
    oracle="""
    SELECT r.r_name AS r_name, n.n_name AS n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY r.r_name, n.n_name
    """,
)
def region_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join through two broadcast dims + two facts."""
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "brand_revenue_broadcast",
    oracle="""
    SELECT p.p_brand AS p_brand,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE) AS revenue,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def brand_revenue_broadcast(spark, sf_dir):
    """Fact↔dim broadcast join: part never shuffles lineitem."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            dsum("l_quantity").alias("qty"),
        )
    )


@query(
    "customer_order_left_join",
    oracle="""
    SELECT c.c_custkey AS c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def customer_order_left_join(spark, sf_dir):
    """LEFT OUTER join preserving order-less customers (count=0, sum=0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@query(
    "customers_with_open_orders_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def customers_with_open_orders_semi(spark, sf_dir):
    """LEFT SEMI join = EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "customers_without_orders_anti",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders_anti(spark, sf_dir):
    """LEFT ANTI join = NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_acctbal")


@query(
    "nation_balance_full_outer",
    oracle="""
    WITH cust AS (SELECT c_nationkey AS nk,
                         CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS cust_bal
                  FROM customer GROUP BY 1),
         supp AS (SELECT s_nationkey AS nk,
                         CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS supp_bal
                  FROM supplier GROUP BY 1)
    SELECT COALESCE(cust.nk, supp.nk) AS nationkey, cust_bal, supp_bal
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def nation_balance_full_outer(spark, sf_dir):
    """FULL OUTER join with nulls surviving on both sides."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(dsum("c_acctbal").alias("cust_bal"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(dsum("s_acctbal").alias("supp_bal"))
    )
    return (
        c.join(s, c.nk == s.snk, "full_outer")
        .select(
            F.coalesce("nk", "snk").alias("nationkey"),
            "cust_bal",
            "supp_bal",
        )
    )


@query(
    "region_segment_cross",
    oracle="""
    SELECT r.r_name AS r_name, s.seg AS seg
    FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    """,
)
def region_segment_cross(spark, sf_dir):
    """Cross join of two tiny inputs (the only safe cross-join shape)."""
    r = load_table(spark, sf_dir, "region")
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg")
    ).distinct()
    return r.select("r_name").crossJoin(F.broadcast(seg))


@query(
    "global_stats",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           {sql_dsum('l_extendedprice')} AS sum_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_price
    FROM lineitem
    """,
)
def global_stats(spark, sf_dir):
    """Global (no-group) aggregate with exact sum/avg + distinct count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        dsum("l_extendedprice").alias("sum_price"),
        (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
    )


@query(
    "rollup_region_nation",
    oracle="""
    SELECT r.r_name AS r_name, n.n_name AS n_name,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total_bal,
           GROUPING(r.r_name) + GROUPING(n.n_name) * 2 AS gid
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def rollup_region_nation(spark, sf_dir):
    """ROLLUP with GROUPING() — subtotals + grand total in one pass
    (partial-aggregatable, no extra shuffle vs plain groupBy)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
            (F.grouping("r_name") + F.grouping("n_name") * 2).alias("gid"),
        )
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("qty")
    )


@query(
    "grouping_sets_priority",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_priority(spark, sf_dir):
    """GROUPING SETS via SQL (DataFrame API has only rollup/cube)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "segment_distinct_counts",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def segment_distinct_counts(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


@query(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def top_orders(spark, sf_dir):
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heap +
    driver merge, never a full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


@query(
    "brand_having",
    oracle="""
    SELECT p_brand, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_price
    FROM part
    GROUP BY p_brand
    HAVING COUNT(*) >= 10
    """,
)
def brand_having(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            (F.sum(dec("p_retailprice")).cast("double") / F.count("*")).alias("avg_price"),
        )
        .filter(F.col("n") >= 10)
    )


@query(
    "pivot_flag_by_status",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS STRING) AS DOUBLE) AS qty_F,
           CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS STRING) AS DOUBLE) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_flag_by_status(spark, sf_dir):
    """Pivot with explicit values (never let Spark scan for them)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS STRING) AS DOUBLE)
           / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE)
           * 100.0 AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation ratio."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(promo).cast("double") / F.sum(rev).cast("double") * 100.0
            ).alias("promo_pct")
        )
    )


@query(
    "orders_with_big_lineitem_exists",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    GROUP BY o_orderstatus
    """,
)
def orders_with_big_lineitem_exists(spark, sf_dir):
    """Correlated EXISTS — planned as a left-semi join by Catalyst."""
    o = load_table(spark, sf_dir, "orders")
    big = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@query(
    "parts_above_avg_price",
    oracle="""
    SELECT COUNT(*) AS n_above
    FROM part
    WHERE p_retailprice > (SELECT CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*) FROM part)
    """,
)
def parts_above_avg_price(spark, sf_dir):
    """Scalar subquery: global avg compared per row (exact avg so both
    engines compare against the identical threshold double)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT COUNT(*) AS n_above
        FROM part
        WHERE p_retailprice > (SELECT CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*) FROM part)
        """
    )


@query(
    "median_order_price",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def median_order_price(spark, sf_dir):
    """Exact percentiles (linear interpolation — same formula in both
    engines on identical doubles)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
    )


# --- write-side planning utilities -----------------------------------

_ROW_BYTES = 104  # conservative on-disk bytes/row for lineitem
_TARGET_MB = 128  # target output file size


@query(
    "write_partition_plan",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS part_month,
           COUNT(*) AS n_rows,
           ROUND(COUNT(*) * {_ROW_BYTES} / 1048576.0, 3) AS est_mb,
           GREATEST(CAST(1 AS BIGINT),
                    CAST(CEIL(COUNT(*) * {_ROW_BYTES}
                              / ({_TARGET_MB} * 1048576.0)) AS BIGINT))
             AS target_files
    FROM lineitem GROUP BY 1
    """,
)
def write_partition_plan(spark, sf_dir):
    """Spill-aware write sizing: per ship-month output partition, the
    estimated bytes and the file count that lands each file at the
    128 MB target — the plan you feed to repartitionByRange before a
    partitioned parquet write so no partition emits a small-file swarm
    or a single multi-GB file. One aggregation shuffle; the estimate
    uses a fixed bytes/row so the plan is deterministic (a real
    deployment would calibrate the constant from footer stats)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count("*")
    est_bytes = n * _ROW_BYTES
    return li.groupBy(
        F.trunc("l_shipdate", "month").alias("part_month")
    ).agg(
        n.alias("n_rows"),
        F.round(est_bytes / F.lit(1048576.0), 3).alias("est_mb"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(est_bytes / F.lit(_TARGET_MB * 1048576.0)).cast("bigint"),
        ).alias("target_files"),
    )


@query(
    "join_size_estimates",
    oracle="""
    WITH lp AS (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey),
    ls AS (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_suppkey),
    lo AS (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey)
    SELECT 'lineitem_self_part' AS join_name,
           CAST(SUM(c * c) AS BIGINT) AS est_rows FROM lp
    UNION ALL
    SELECT 'lineitem_self_supp', CAST(SUM(c * c) AS BIGINT) FROM ls
    UNION ALL
    SELECT 'orders_lineitem', CAST(SUM(c) AS BIGINT) FROM lo
    """,
)
def join_size_estimates(spark, sf_dir):
    """Planner-style join cardinality estimation from per-key count
    histograms: |A join B on k| = sum_k cnt_A(k)*cnt_B(k), computed
    WITHOUT running the join. The self-join rows are exactly the
    candidate-pair counts a dedup blocking key would generate — this
    is the estimator you run BEFORE committing to a blocking scheme at
    100 TB (a hot key shows up here as a huge product, not as a dead
    executor). One groupBy per key column; output is 3 rows."""
    li = load_table(spark, sf_dir, "lineitem")

    def hist_sq(key, name):
        h = li.groupBy(key).agg(F.count("*").alias("c"))
        return h.agg(
            F.lit(name).alias("join_name"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("est_rows"),
        )

    lo = li.groupBy("l_orderkey").agg(F.count("*").alias("c"))
    orders_li = lo.agg(
        F.lit("orders_lineitem").alias("join_name"),
        F.sum("c").cast("bigint").alias("est_rows"),
    )
    return (
        hist_sq("l_partkey", "lineitem_self_part")
        .union(hist_sq("l_suppkey", "lineitem_self_supp"))
        .union(orders_li)
    )


_ZM_BUCKET = 1000  # orders per zone (stands in for a parquet row group)
_ZM_PROBES = (
    (1, 1000.0, 2000.0),
    (2, 50000.0, 60000.0),
    (3, 300000.0, 400000.0),
)


@query(
    "zone_map_pruning_audit",
    oracle=f"""
    WITH zones AS (
      SELECT o_orderkey // {_ZM_BUCKET} AS zone,
             MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
      FROM orders GROUP BY 1),
    probes(probe_id, lo, hi) AS (VALUES {", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _ZM_PROBES)}),
    scan AS (
      SELECT p.probe_id, COUNT(z.zone) AS zones_scanned
      FROM probes p LEFT JOIN zones z ON z.mx >= p.lo AND z.mn <= p.hi
      GROUP BY 1),
    matched AS (
      SELECT p.probe_id, COUNT(o.o_orderkey) AS rows_matched
      FROM probes p LEFT JOIN orders o
        ON o.o_totalprice >= p.lo AND o.o_totalprice <= p.hi
      GROUP BY 1),
    tot AS (SELECT COUNT(*) AS zones_total FROM zones)
    SELECT s.probe_id, s.zones_scanned, t.zones_total, m.rows_matched
    FROM scan s JOIN matched m USING (probe_id) CROSS JOIN tot t
    """,
)
def zone_map_pruning_audit(spark, sf_dir):
    """Zone-map (min/max data-skipping) effectiveness audit: build
    per-zone min/max statistics for o_totalprice (a zone stands in for
    a parquet row group / data file), then report how many zones each
    probe range actually needs to scan vs the total — the
    file-skipping decision every lakehouse reader makes from footer
    stats before touching data.

    Scale shape: the stats table is O(zones) — thousands of rows per
    TB — and lives broadcast; probing is a broadcast range join
    against it, so skipping costs no shuffle of the fact table at all.
    rows_matched double-checks soundness: counted from the full scan,
    it must (and does) agree with scanning only the admitted zones."""
    o = load_table(spark, sf_dir, "orders")
    zones = o.groupBy(
        F.expr(f"o_orderkey DIV {_ZM_BUCKET}").alias("zone")
    ).agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    pdf = spark.createDataFrame(
        list(_ZM_PROBES), "probe_id int, lo double, hi double"
    )
    scan = (
        pdf.join(
            F.broadcast(zones),
            (F.col("mx") >= F.col("lo")) & (F.col("mn") <= F.col("hi")),
            "left",
        )
        .groupBy("probe_id")
        .agg(F.count("zone").alias("zones_scanned"))
    )
    matched = (
        pdf.join(
            o,
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") <= F.col("hi")),
            "left",
        )
        .groupBy("probe_id")
        .agg(F.count("o_orderkey").alias("rows_matched"))
    )
    tot = zones.agg(F.count("*").alias("zones_total"))
    return (
        scan.join(matched, "probe_id")
        .crossJoin(F.broadcast(tot))
        .select("probe_id", "zones_scanned", "zones_total", "rows_matched")
    )
