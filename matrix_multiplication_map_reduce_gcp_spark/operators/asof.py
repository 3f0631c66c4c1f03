"""As-of (point-in-time) join and range join — operators Spark lacks
natively (SURVEY.md §2.3 joins row), composed from built-ins.

As-of implementation is the union-sort trick, the shape that survives
100 TB: tag both streams, union, one window sort per key, carry the
last-seen right-side row forward with last(ignorenulls). One shuffle
+ one sort — no per-row range probe, no join blow-up (contrast with
the join-then-filter rewrite, which multiplies each left row by ALL
earlier right rows before pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: dict[str, str],
) -> DataFrame:
    """For each left row: the latest right row with
    right_time <= left_time, per key `on`. Right rows must be unique
    per (on, right_time) — pre-aggregate if not."""
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        "*",
        *[F.lit(None).cast(right.schema[src].dataType).alias(dst) for src, dst in right_cols.items()],
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )
    # Right rows sort BEFORE left rows at equal time (<= semantics).
    w = (
        W.partitionBy("__k")
        .orderBy("__t", F.desc("__is_right"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = rt.unionByName(lt).select(
        "*",
        *[
            F.last(dst, ignorenulls=True).over(w).alias(f"__carry_{dst}")
            for dst in right_cols.values()
        ],
    )
    out = carried.filter(F.col("__is_right") == 0).select(
        *left.columns,
        *[F.col(f"__carry_{dst}").alias(dst) for dst in right_cols.values()],
    )
    return out


@query(
    "asof_last_order_before_event",
    oracle="""
    WITH o1 AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS last_orderkey
                FROM orders GROUP BY 1, 2),
    cand AS (
      SELECT e.event_id, e.user_id, o.o_orderdate AS last_orderdate, o.last_orderkey,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.last_orderkey DESC) AS rn
      FROM events e JOIN o1 o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT event_id, user_id, last_orderdate, last_orderkey
    FROM cand WHERE rn = 1
    """,
)
def asof_last_order_before_event(spark, sf_dir):
    """Point-in-time correctness join: each event picks the customer's
    most recent order as of the event time."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey")
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols={"o_orderdate": "last_orderdate", "o_orderkey": "last_orderkey"},
    )
    return joined.filter(F.col("last_orderkey").isNotNull()).select(
        "event_id", "user_id", "last_orderdate", "last_orderkey"
    )


@query(
    "range_join_quantity_tiers",
    oracle="""
    WITH tiers(tier, lo, hi) AS (VALUES
      ('small', 0.0, 15.0), ('medium', 15.0, 35.0), ('large', 35.0, 100.0))
    SELECT t.tier AS tier, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue
    FROM lineitem l JOIN tiers t
      ON l.l_quantity > t.lo AND l.l_quantity <= t.hi
    GROUP BY t.tier
    """,
)
def range_join_quantity_tiers(spark, sf_dir):
    """Range (theta) join against a broadcast tier table — the
    non-equi-join shape; Spark plans BroadcastNestedLoopJoin, which is
    exactly right when one side is a handful of rows."""
    li = load_table(spark, sf_dir, "lineitem")
    tiers = F.broadcast(
        spark.createDataFrame(
            [("small", 0.0, 15.0), ("medium", 15.0, 35.0), ("large", 35.0, 100.0)],
            "tier string, lo double, hi double",
        )
    )
    cond = (F.col("l_quantity") > F.col("lo")) & (F.col("l_quantity") <= F.col("hi"))
    return (
        li.join(tiers, cond)
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "pit_feature_join",
    oracle="""
    WITH daily AS (
      SELECT o_custkey, o_orderdate, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
      FROM orders GROUP BY 1, 2),
    cum AS (
      SELECT o_custkey, o_orderdate,
             CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
             SUM(spend) OVER w AS cum_spend
      FROM daily
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                   ROWS UNBOUNDED PRECEDING)),
    feat AS (
      SELECT e.event_id, e.user_id, c.cum_n, c.cum_spend,
             c.o_orderdate AS last_orderdate,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY c.o_orderdate DESC) AS rn
      FROM events e LEFT JOIN cum c
        ON c.o_custkey = e.user_id AND c.o_orderdate <= e.ts)
    SELECT event_id, user_id,
           COALESCE(cum_n, 0) AS n_orders_before,
           CAST(COALESCE(cum_spend, 0) AS DOUBLE) AS spend_before,
           last_orderdate
    FROM feat WHERE rn = 1
    """,
)
def pit_feature_join(spark, sf_dir):
    """Leakage-free feature extraction (the feature-store
    point-in-time join): every event sees the customer's order count /
    exact-decimal lifetime spend AS OF the event instant — never a
    later order. Shape: per-customer daily aggregates get running
    cumulative features (one window), then the union-sort as-of trick
    carries the latest feature row onto each event — one shuffle + one
    sort per side, NO join blow-up (the naive join-then-rank the
    oracle spells multiplies each event by all earlier order days).
    Events with no history get (0, 0.0, NULL) — exactly what a
    training pipeline must emit for cold-start rows."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("spend"),
        )
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = daily.select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("spend").over(w).alias("cum_spend"),
    )
    joined = asof_join(
        events,
        cum,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols={
            "cum_n": "n_orders_before",
            "cum_spend": "spend_raw",
            "o_orderdate": "last_orderdate",
        },
    )
    return joined.select(
        "event_id",
        "user_id",
        F.coalesce("n_orders_before", F.lit(0)).cast("bigint").alias("n_orders_before"),
        F.coalesce(F.col("spend_raw"), F.lit(0).cast("decimal(12,2)"))
        .cast("double")
        .alias("spend_before"),
        "last_orderdate",
    )


@query(
    "asof_forward_click_to_purchase",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type IN ('click', 'purchase')),
    cl AS (
      SELECT c.event_id AS click_id, c.user_id, c.ts AS c_ts,
             (SELECT p.event_id FROM ev p
              WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
                AND p.ts >= c.ts
              ORDER BY p.ts, p.event_id LIMIT 1) AS purchase_id
      FROM ev c WHERE c.event_type = 'click')
    SELECT cl.click_id, cl.user_id, cl.purchase_id,
           epoch_us(p.ts) - epoch_us(cl.c_ts) AS wait_us
    FROM cl LEFT JOIN ev p ON p.event_id = cl.purchase_id
    """,
)
def asof_forward_click_to_purchase(spark, sf_dir):
    """FORWARD as-of join (merge_asof direction='forward'): for every
    click, the next purchase by the same user at-or-after it, with the
    wait in exact integer microseconds — time-to-convert.

    Same union-sort shape as the backward as-of (asof.py:21), mirrored:
    tag both streams, ONE window sort per user, carry the next
    purchase with first(ignorenulls) over the FOLLOWING frame. The
    oracle is the naive correlated top-1 subquery; the union-sort plan
    replaces the per-row probe with a single shuffle+sort — the only
    shape that survives dense right sides at 100 TB. Clicks sort
    before equal-timestamp purchases (tag 0 < 1) so the at-or-after
    boundary is inclusive under the ROWS frame."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("tag"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "p_id"
        ),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = tagged.select(
        "*",
        F.first("p_id", ignorenulls=True).over(w).alias("next_p_id"),
        F.first("p_ts", ignorenulls=True).over(w).alias("next_p_ts"),
    )
    return carried.filter(F.col("tag") == 0).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("next_p_id").alias("purchase_id"),
        (F.unix_micros("next_p_ts") - F.unix_micros("ts")).alias("wait_us"),
    )
