"""Window functions: ranking, analytic (lag/lead/first/last), running
and sliding frames, sessionization. Absent entirely from the reference
(SURVEY.md §2.3); all built-in here.

Determinism discipline: every ORDER BY inside a window carries a
unique tiebreak column so both engines rank identically; running sums
are decimal-backed (a window sum over a fixed prefix is exact, hence
order-independent across engines).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dec
from ..registry import query


@query(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def top3_orders_per_customer(spark, sf_dir):
    """Top-k per group = row_number + filter (no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS running_spend,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
    FROM orders
    """,
)
def customer_running_spend(spark, sf_dir):
    """Running total + lag/lead over a per-customer event timeline."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "supplier_balance_ranks",
    oracle="""
    SELECT s_suppkey,
           RANK()         OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
           DENSE_RANK()   OVER (ORDER BY s_acctbal DESC, s_suppkey) AS drnk,
           NTILE(4)       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile,
           PERCENT_RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS prnk,
           CUME_DIST()    OVER (ORDER BY s_acctbal DESC, s_suppkey) AS cdist
    FROM supplier
    """,
)
def supplier_balance_ranks(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy(F.desc("s_acctbal"), "s_suppkey")
    return s.select(
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "order_price_moving_avg",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
    FROM orders
    """,
)
def order_price_moving_avg(spark, sf_dir):
    """Sliding 3-row frame; avg = exact windowed sum / windowed count."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_orderkey",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("mov_avg"),
    )


@query(
    "first_last_order_dates",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
           LAST_VALUE(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    """,
)
def first_last_order_dates(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w).alias("last_order"),
    ).distinct()


@query(
    "trailing_30d_customer_spend",
    oracle="""
    WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
                      CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day
               FROM orders)
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY day
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE)
             AS spend_30d,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
                          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_orders_30d
    FROM o
    """,
)
def trailing_30d_customer_spend(spark, sf_dir):
    """RANGE frame (value-based, not row-based): per order, the
    customer's spend over the trailing 30 DAYS — orders on the same
    day share a frame, which a ROWS frame can't express. Ordering key
    is epoch-day so both engines bound the frame identically."""
    o = load_table(spark, sf_dir, "orders")
    # NTZ timestamps don't cast to long directly; go via TIMESTAMP
    # (session TZ is UTC, so epoch matches DuckDB's naive epoch()).
    day = F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day.alias("day"))
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
        F.count("*").over(w).alias("n_orders_30d"),
    )


@query(
    "gap_filled_hourly_counts",
    oracle="""
    WITH bounds AS (
      SELECT CAST(DATE_TRUNC('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(DATE_TRUNC('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events),
    grid AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds),
    actual AS (
      SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour_start,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1)
    SELECT g.hour_start AS hour_start,
           COALESCE(a.n, 0) AS n,
           COALESCE(a.total_value, 0.0) AS total_value
    FROM grid g LEFT JOIN actual a ON g.hour_start = a.hour_start
    """,
)
def gap_filled_hourly_counts(spark, sf_dir):
    """Time-series gap filling: a generated hour grid (sequence +
    explode over the corpus bounds) left-joined to actual hourly
    aggregates, empty hours zero-filled — the densification every
    time-series rollup needs."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    actual = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )
    return grid.join(actual, "hour_start", "left").select(
        "hour_start",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@query(
    "batch_session_window",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def batch_session_window(spark, sf_dir):
    """F.session_window on a BATCH DataFrame — Spark's native gap-merge
    session operator works outside streaming too (one pass, no window
    functions); same results as the lag-based formulation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "price_histogram",
    oracle="""
    SELECT LEAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def price_histogram(spark, sf_dir):
    """Fixed-width histogram with a clamped overflow bucket — the
    one-pass distribution profile. Bucketing uses floor(x/width) on
    identical doubles (NOT a double→int cast: DuckDB's cast ROUNDS
    while Spark's TRUNCATES — boundary values would land in different
    buckets)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint"), F.lit(9)
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "user_sessions",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM marked)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def user_sessions(spark, sf_dir):
    """Batch sessionization: 30-min inactivity gap → new session
    (lag + cumulative-sum of gap markers).

    Oracle portability (driver-gate hash): the windowed SUM is cast to
    BIGINT — DuckDB's integer SUM yields HUGEINT, which the driver's
    value canonicalization does not treat as equal to Spark's bigint
    (round-1 CORRECTNESS: the ONLY hash-fail was the only checked
    query with a HUGEINT output column). Events timestamps are CAST to
    µs TIMESTAMP in the oracle to mirror the Spark loader's
    nanos→micros truncation, and the gap compares epoch MICROseconds
    (not second-truncated longs) so both engines split sessions at
    exactly the same sub-second gaps."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    marked = e.select("user_id", "ts", "event_id", new_session.alias("new_session"))
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "trailing_30min_event_stats",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(value AS DECIMAL(12,2)) AS v
      FROM events)
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_30m,
           CAST(CAST(SUM(v) OVER w AS STRING) AS DOUBLE) AS sum_value_30m
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
    """,
)
def trailing_30min_event_stats(spark, sf_dir):
    """Time-interval RANGE frame on the TIMESTAMP(NANOS) events table
    — the trickiest table for frame bounds. Per event: the user's
    event count and exact decimal value-sum over the trailing 30
    MINUTES of event time. The ordering key is epoch MICROseconds
    (unix_micros == DuckDB epoch_us over the µs-cast ts), so both
    engines place every frame bound on the identical integer axis;
    RANGE frames are peer-inclusive in both engines, making ties
    deterministic without a tiebreak column."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-1800 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_30m"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_value_30m"),
    )


@query(
    "event_value_locf_hourly",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts
      FROM events),
    s AS (
      SELECT user_id, event_id, value, ts,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot
      FROM e),
    b AS (SELECT user_id, MIN(slot) AS lo, MAX(slot) AS hi FROM s GROUP BY 1),
    grid AS (
      SELECT user_id, r.sl AS slot
      FROM b, UNNEST(range(lo, hi + 1)) AS r(sl)),
    obs AS (
      SELECT user_id, slot, value
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, slot
                                         ORDER BY ts DESC, event_id DESC)
                        AS rn
            FROM s)
      WHERE rn = 1),
    filled AS (
      SELECT g.user_id, g.slot, o.value AS obs_value
      FROM grid g LEFT JOIN obs o USING (user_id, slot))
    SELECT user_id,
           make_timestamp(slot * 3600 * 1000000) AS slot_start,
           LAST_VALUE(obs_value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY slot
                   ROWS UNBOUNDED PRECEDING) AS value,
           obs_value IS NOT NULL AS is_observed
    FROM filled
    """,
)
def event_value_locf_hourly(spark, sf_dir):
    """Time-series resampling with forward fill (LOCF): each user's
    value stream regularized onto an hourly grid spanning their active
    range; empty hours carry the last observation forward (the
    feature-regularization step before any fixed-step model). The slot
    value is the LAST event in the hour (ts, event_id tiebreak); fill
    is last(ignorenulls) over one per-user sort — values are carried
    verbatim (no arithmetic), so doubles stay bit-identical. Scale:
    the grid explode is bounded by active-range x granularity, and
    every step shares the user_id partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", "ts"
    )
    s = ev.withColumn(
        "slot", F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    )
    b = s.groupBy("user_id").agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    grid = b.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("slot")
    )
    obs = (
        s.groupBy("user_id", "slot")
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("m"))
        .select("user_id", "slot", F.col("m.value").alias("obs_value"))
    )
    filled = grid.join(obs, ["user_id", "slot"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return filled.select(
        "user_id",
        F.timestamp_seconds(F.col("slot") * 3600).alias("slot_start"),
        F.last("obs_value", ignorenulls=True).over(w).alias("value"),
        F.col("obs_value").isNotNull().alias("is_observed"),
    )
