"""Approximate aggregates: HyperLogLog++ distinct counts and
approximate quantiles. Sketch VALUES differ across engines by nature,
so the hash-checkable contract is: emit the exact answer plus a
``within_tolerance`` boolean computed in Spark from the sketch; the
oracle recomputes the exact answer and expects ``true``. The row is
fully driver-verifiable without pretending HLL/GK sketches agree
cross-engine (tests/test_sources.py::test_approx_aggregates_within_tolerance
exercises the same contract locally). For sketches whose contents ARE
engine-portable — count-min, Bloom — see operators/sketches.py, where
the estimates themselves are hash-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable_hash import sql_hash32_unsalted
from ..registry import query


@query(
    "approx_distinct_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS within_tolerance
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def approx_distinct_counts(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd 5%) per order status — the
    one-pass no-shuffle-of-distinct-values sketch you actually run at
    100 TB. within_tolerance asserts the sketch lands within 3×rsd of
    the exact count (a ~99.7% bound); the oracle expects true."""
    o = load_table(spark, sf_dir, "orders")
    approx = F.approx_count_distinct("o_custkey", rsd=0.05)
    exact = F.countDistinct("o_custkey")
    return o.groupBy("o_orderstatus").agg(
        exact.alias("exact_customers"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.15 * exact.cast("double")
        ).alias("within_tolerance"),
    )


@query(
    "approx_quantiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS exact_median,
           TRUE AS within_tolerance
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def approx_quantiles(spark, sf_dir):
    """percentile_approx (GK sketch, accuracy 1000) vs the exact
    interpolated percentile (bit-portable across engines, proven by
    median_order_price). within_tolerance bounds the sketch at 5%
    relative error; the oracle expects true."""
    o = load_table(spark, sf_dir, "orders")
    approx = F.percentile_approx("o_totalprice", 0.5, 1000)
    exact = F.expr("percentile(o_totalprice, 0.5)")
    return o.groupBy("o_orderpriority").agg(
        exact.alias("exact_median"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("within_tolerance"),
    )


@query(
    "hll_mergeable_counts",
    oracle="""
    SELECT n.n_regionkey, r.r_name,
           COUNT(DISTINCT o.o_custkey) AS exact_customers,
           TRUE AS within_tolerance
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def hll_mergeable_counts(spark, sf_dir):
    """MERGEABLE distinct-count sketches — the incremental-analytics
    shape approx_distinct_counts can't show: one HLL sketch built per
    nation (hll_sketch_agg), then UNIONED up to region level
    (hll_union_agg) and only then estimated. At 100 TB this is how
    distinct counts compose without re-reading raw data: per-day /
    per-partition sketch rows (a few KB each) are stored and any
    rollup (week, month, region, global) is a sketch union — the raw
    keys shuffle once, ever. within_tolerance asserts the TWO-LEVEL
    estimate lands within 15% of the exact region-level count (HLL
    default lgConfigK=12 ⇒ rsd ≈ 1.6%; union adds no bias); the
    oracle recomputes the exact count and expects true."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    per_nation = joined.groupBy("n_nationkey", "n_regionkey").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_nation.groupBy("n_regionkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = joined.groupBy("n_regionkey").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return (
        exact.join(merged, "n_regionkey")
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            "n_regionkey",
            "r_name",
            "exact_customers",
            (
                F.abs(F.col("est").cast("double") - F.col("exact_customers").cast("double"))
                <= 0.15 * F.col("exact_customers").cast("double")
            ).alias("within_tolerance"),
        )
    )


UNIVERSE_MOD = 10  # keep 1-in-10 of the key universe


@query(
    "universe_sample_join",
    oracle=f"""
    WITH su AS (
      SELECT * FROM customer
      WHERE {{h}} % {UNIVERSE_MOD} = 0),
    se AS (
      SELECT * FROM events
      WHERE {{he}} % {UNIVERSE_MOD} = 0)
    SELECT c.c_mktsegment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM se e JOIN su c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """.format(
        h=sql_hash32_unsalted("c_custkey"),
        he=sql_hash32_unsalted("user_id"),
    ),
)
def universe_sample_join(spark, sf_dir):
    """Universe sampling (BlinkDB/Quickr): when a query JOINS two
    sampled tables, independent Bernoulli samples are worthless — a
    p% sample of each side keeps only p²% of join output and biases
    every group. The fix is to sample the JOIN-KEY UNIVERSE with one
    shared hash: keep a row iff hash(key) lands in the kept bucket
    range, on BOTH tables. Then join-of-samples == sample-of-join
    exactly over the kept universe, so per-segment activity profiles
    computed on 10% of users are unbiased and internally consistent.

    The sample predicates are map-side filters that reach the scan
    (no shuffle spent on discarded rows) — at 100 TB this is the
    difference between exploratory joins costing 1% and costing 100%.
    The portable md5 hash makes the kept universe identical across
    engines, so the oracle checks the exact kept-universe answer."""
    from ..functions.portable_hash import hash32_unsalted

    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    su = c.filter(hash32_unsalted(F.col("c_custkey")) % UNIVERSE_MOD == 0)
    se = e.filter(hash32_unsalted(F.col("user_id")) % UNIVERSE_MOD == 0)
    return (
        se.join(su, se.user_id == su.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
