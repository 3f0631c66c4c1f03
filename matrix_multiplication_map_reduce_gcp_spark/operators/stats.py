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

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dec
from ..functions.portable_hash import sql_hash32_unsalted
from ..registry import query

# Σ of decimal products stays exact: (12,2)×(12,2) → scale-4 decimals.


@query(
    "stats_price_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxy
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
           CAST(CAST(SUM(CASE WHEN is_outlier
                         THEN CAST(o_totalprice AS DECIMAL(12,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS STRING) AS DOUBLE)
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
           ROUND(CAST(CAST(SUM(CAST(cp AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*), 6)
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


@query(
    "chi_square_contingency",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
      FROM orders GROUP BY 1, 2),
    cells AS (
      SELECT o_orderpriority, o_orderstatus, n,
             SUM(n) OVER (PARTITION BY o_orderpriority) AS row_tot,
             SUM(n) OVER (PARTITION BY o_orderstatus) AS col_tot,
             SUM(n) OVER () AS grand_tot
      FROM obs)
    SELECT o_orderpriority, o_orderstatus, n,
           ROUND(CAST(row_tot * col_tot AS DOUBLE) / grand_tot, 6) AS expected,
           ROUND((n - CAST(row_tot * col_tot AS DOUBLE) / grand_tot)
                 * (n - CAST(row_tot * col_tot AS DOUBLE) / grand_tot)
                 / (CAST(row_tot * col_tot AS DOUBLE) / grand_tot), 6)
             AS contribution
    FROM cells
    """,
)
def chi_square_contingency(spark, sf_dir):
    """Chi-square independence test between order priority and status:
    per-cell observed count, expected count (from the marginals), and
    chi-square contribution (n-e)^2/e.

    Emitting per-CELL contributions instead of the summed statistic
    keeps every float op per-row (deterministic, order-independent) —
    the caller sums a handful of cells. Scale shape: one groupBy
    shuffle over the data; the marginal windows then run over the
    aggregated CELLS (|priorities|x|statuses| rows), so the
    single-partition window is O(cells), not O(rows), at any scale."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    cells = obs.select(
        "*",
        F.sum("n").over(W.partitionBy("o_orderpriority")).alias("row_tot"),
        F.sum("n").over(W.partitionBy("o_orderstatus")).alias("col_tot"),
        F.sum("n").over(W.partitionBy()).alias("grand_tot"),
    )
    e = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col(
        "grand_tot"
    )
    d = F.col("n") - e
    return cells.select(
        "o_orderpriority",
        "o_orderstatus",
        "n",
        F.round(e, 6).alias("expected"),
        F.round(d * d / e, 6).alias("contribution"),
    )


_WS_K = 5  # sample size per stratum
# u in (0,1] from the portable 32-bit hash; key = ln(u)/w is the
# Efraimidis–Spirakis exponential sort key (top-k by key ⇔ weighted
# sample without replacement), computed from integers through a
# textually identical formula in both engines.
_WS_U = "4294967296.0"


@query(
    "weighted_sample_orders",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             LN(({{h}} + 1) / {_WS_U}) / o_totalprice AS k
      FROM orders),
    ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY k DESC, o_orderkey) AS rnk
      FROM keyed)
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
    FROM ranked WHERE rnk <= {_WS_K}
    """.format(h=sql_hash32_unsalted("o_orderkey")),
)
def weighted_sample_orders(spark, sf_dir):
    """Deterministic weighted sampling without replacement: top-5
    orders per priority under the Efraimidis–Spirakis exponential
    key ln(u)/w with u derived from the portable md5 hash of the
    order key and w = o_totalprice — price-proportional inclusion
    probability, zero RNG state, stable across runs/partitionings/
    engines (the property a reproducible training-data sampler needs).

    Scale shape: the key is map-side arithmetic; selection is one
    top-k-per-group window (rank shuffle on the stratum key). For
    global (unstratified) k at 100 TB the same key feeds a
    TakeOrderedAndProject instead — no extra machinery."""
    from ..functions.portable_hash import hash32_unsalted

    o = load_table(spark, sf_dir, "orders")
    u = (hash32_unsalted(F.col("o_orderkey")) + 1) / F.lit(4294967296.0)
    keyed = o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        (F.log(u) / F.col("o_totalprice")).alias("k"),
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("k"), F.col("o_orderkey")
    )
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _WS_K)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "weighted_median_price",
    oracle="""
    WITH pw AS (
      SELECT l_returnflag, l_extendedprice AS p,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS w
      FROM lineitem GROUP BY 1, 2),
    c AS (
      SELECT l_returnflag, p,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY p) AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM pw)
    SELECT l_returnflag, MIN(p) AS weighted_median_price
    FROM c WHERE 2 * cum >= tot GROUP BY 1
    """,
)
def weighted_median_price(spark, sf_dir):
    """Quantity-weighted (lower) median price per return flag: the
    smallest price whose cumulative weight reaches half the total.

    EXACT, not sketched: weights accumulate in decimal (associative),
    the boundary test 2*cum >= tot is integer-exact decimal
    arithmetic — no float comparison can flip the chosen row. Scale
    shape: pre-aggregate to (group, value) first so the cumulative
    window runs over DISTINCT values (deterministic ties, far fewer
    rows), then one window sort per group — the standard exact
    weighted-quantile plan; for percentile grids the same cum/tot
    columns answer every quantile in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    pw = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("p")
    ).agg(F.sum(dec("l_quantity")).alias("w"))
    c = pw.select(
        "l_returnflag",
        "p",
        F.sum("w").over(W.partitionBy("l_returnflag").orderBy("p")).alias("cum"),
        F.sum("w").over(W.partitionBy("l_returnflag")).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("p").alias("weighted_median_price"))
    )


@query(
    "ols_price_by_quantity",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
           sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (sx / n)
             AS intercept,
           ((sxy - sx * sy / n) * (sxy - sx * sy / n))
             / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS r2
    FROM s
    """,
)
def ols_price_by_quantity(spark, sf_dir):
    """Group-wise simple linear regression (price ~ quantity per
    return flag): slope, intercept and R² all derived from the SAME
    five exact decimal power sums as stats_price_moments — in-engine
    ML-lite with ONE aggregation shuffle, no MLlib, no iteration. At
    100 TB this is how you fit millions of per-group baselines (one
    grouped pass), and the whole per-group float derivation happens on
    a single aggregated row, so results are bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
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
    cov = sxy - sx * sy / n
    varx = sxx - sx * sx / n
    slope = cov / varx
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        (sy / n - slope * (sx / n)).alias("intercept"),
        ((cov * cov) / (varx * (syy - sy * sy / n))).alias("r2"),
    )


N_HIST_BUCKETS = 10


@query(
    "equi_width_price_histogram",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc
      FROM lineitem),
    stats AS (
      SELECT MIN(xc) AS minc, MAX(xc) AS maxc, COUNT(*) AS total FROM cents),
    bucketed AS (
      SELECT LEAST({N_HIST_BUCKETS - 1},
                   ((c.xc - s.minc) * {N_HIST_BUCKETS})
                     // GREATEST(s.maxc - s.minc, 1))
               AS bucket,
             s.minc, s.maxc, s.total
      FROM cents c CROSS JOIN stats s)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(minc + (bucket * (maxc - minc)) // {N_HIST_BUCKETS} AS BIGINT)
             AS lo_cents,
           CAST(minc + ((bucket + 1) * (maxc - minc)) // {N_HIST_BUCKETS}
                AS BIGINT) AS hi_cents,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE) / MIN(total) AS frac
    FROM bucketed
    GROUP BY bucket, minc, maxc
    """,
)
def equi_width_price_histogram(spark, sf_dir):
    """10-bucket equi-width histogram of l_extendedprice — the
    profiling primitive behind optimizer statistics and data-quality
    dashboards, built the way it must be at 100 TB: pass 1 computes
    global (min, max, count) — three partially-aggregated scalars —
    which BROADCAST onto pass 2's map-only bucket assignment, followed
    by one ≤10-group aggregate. No sort, no sampling, two scans.

    All arithmetic is integer cents (prices enter on the exact
    DECIMAL(12,2) grid): bucket ids and bucket bounds are integer
    divisions, so both engines agree bit-for-bit; the only float is
    the per-row frac = n/total of two integers. The divisor is
    greatest(maxc - minc, 1) — mirrored in the oracle — so a
    degenerate all-equal-price corpus collapses to one well-formed
    bucket 0 instead of a NULL-bucket row."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select((dec("l_extendedprice") * 100).cast("bigint").alias("xc"))
    stats = cents.agg(
        F.min("xc").alias("minc"),
        F.max("xc").alias("maxc"),
        F.count("*").alias("total"),
    )
    bucketed = cents.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.lit(N_HIST_BUCKETS - 1),
            F.expr(
                f"((xc - minc) * {N_HIST_BUCKETS}) "
                "div greatest(maxc - minc, 1)"
            ),
        ).alias("bucket"),
        "minc",
        "maxc",
        "total",
    )
    return bucketed.groupBy("bucket", "minc", "maxc").agg(
        F.count("*").alias("n"), F.min("total").alias("total")
    ).select(
        F.col("bucket").cast("int").alias("bucket"),
        (F.col("minc") + F.expr(f"(bucket * (maxc - minc)) div {N_HIST_BUCKETS}"))
        .cast("bigint")
        .alias("lo_cents"),
        (
            F.col("minc")
            + F.expr(f"((bucket + 1) * (maxc - minc)) div {N_HIST_BUCKETS}")
        )
        .cast("bigint")
        .alias("hi_cents"),
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.col("total")).alias("frac"),
    )
