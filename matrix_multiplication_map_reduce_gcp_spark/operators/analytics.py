"""Product-analytics workloads over the events/orders tables: funnels,
retention cohorts, referential-integrity audits, time-hierarchy
rollups — the query shapes an engine's end users actually run daily.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dec
from ..registry import query


# The ordered view→click→purchase funnel is computed identically over
# the batch events table and the events STREAM (streaming/queries.py::
# stream_funnel_stages): the per-user triple of conditional MINs is
# commutative, so the same two aggregation stages apply to both. The
# oracle and both Spark stages live HERE so batch and streaming funnel
# semantics cannot drift apart.
FUNNEL_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
    firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM ev GROUP BY user_id)
    SELECT
      COUNT(*) AS n_users,
      COUNT(t_view) AS stage_view,
      COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 END) AS stage_click,
      COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                  AND t_purchase > t_click THEN 1 END) AS stage_purchase
    FROM firsts
    """


def funnel_firsts(events):
    """(user_id, t_view, t_click, t_purchase) — per-user first
    timestamp of each stage, as three conditional MINs (commutative,
    hence stream-safe)."""
    return events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )


def funnel_stage_counts(firsts):
    """One-row stage report from the per-user triple: a user counts
    toward a stage only if every earlier stage strictly precedes it."""
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("stage_view"),
        F.count(
            F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1)
        ).alias("stage_click"),
        F.count(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("stage_purchase"),
    )


@query("funnel_view_click_purchase", oracle=FUNNEL_ORACLE)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered funnel: users whose first view precedes their first
    click precedes their first purchase. One conditional-min
    aggregation pass — no self-joins."""
    e = load_table(spark, sf_dir, "events")
    return funnel_stage_counts(funnel_firsts(e))


@query(
    "weekly_retention_cohorts",
    oracle="""
    WITH user_weeks AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
      FROM events),
    firsts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM user_weeks GROUP BY 1)
    SELECT f.cohort_wk AS cohort_wk,
           u.wk - f.cohort_wk AS weeks_since,
           COUNT(DISTINCT u.user_id) AS active_users
    FROM user_weeks u JOIN firsts f ON u.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def weekly_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-active week,
    counted in each subsequent week. Two aggregations + one join on
    user_id — the standard growth-analytics query."""
    e = load_table(spark, sf_dir, "events")
    wk = F.expr("CAST(floor(CAST(CAST(ts AS TIMESTAMP) AS LONG) / 604800) AS BIGINT)")
    user_weeks = e.select("user_id", wk.alias("wk")).distinct()
    firsts = user_weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        user_weeks.join(firsts, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("weeks_since"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem_without_order' AS violation, COUNT(*) AS n FROM (
      SELECT l.l_orderkey FROM lineitem l LEFT JOIN orders o
        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
    UNION ALL
    SELECT 'order_without_customer', COUNT(*) FROM (
      SELECT o.o_orderkey FROM orders o LEFT JOIN customer c
        ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
    UNION ALL
    SELECT 'customer_without_nation', COUNT(*) FROM (
      SELECT c.c_custkey FROM customer c LEFT JOIN nation n
        ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
    """,
)
def referential_integrity_audit(spark, sf_dir):
    """Data-quality audit: orphan counts along the FK chain
    lineitem→orders→customer→nation, as one report (anti-joins)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    spark_rows = [
        ("lineitem_without_order", l.join(o, l.l_orderkey == o.o_orderkey, "left_anti")),
        ("order_without_customer", o.join(c, o.o_custkey == c.c_custkey, "left_anti")),
        ("customer_without_nation", c.join(n, c.c_nationkey == n.n_nationkey, "left_anti")),
    ]
    out = None
    for name, df in spark_rows:
        row = df.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("violation"), "n"
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "time_rollup_revenue",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue,
           GROUPING(EXTRACT(YEAR FROM o_orderdate))
             + GROUPING(EXTRACT(MONTH FROM o_orderdate)) * 2 AS gid
    FROM orders
    GROUP BY ROLLUP(EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate))
    """,
)
def time_rollup_revenue(spark, sf_dir):
    """Time-hierarchy rollup: month → year → grand total in one pass."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("long")
    mo = F.month("o_orderdate").cast("long")
    return (
        o.select(yr.alias("yr"), mo.alias("mo"), "o_totalprice")
        .rollup("yr", "mo")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            (F.grouping("yr") + F.grouping("mo") * 2).alias("gid"),
        )
    )


@query(
    "scd2_user_event_history",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events),
    flagged AS (
      SELECT *, CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                     THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    seg AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS seg_id
      FROM flagged),
    runs AS (
      SELECT user_id, seg_id, MIN(event_type) AS event_type,
             MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM seg GROUP BY 1, 2),
    hist AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from, seg_id) AS valid_to,
             n_events
      FROM runs)
    SELECT user_id, event_type, valid_from, valid_to,
           valid_to IS NULL AS is_current, n_events
    FROM hist
    """,
)
def scd2_user_event_history(spark, sf_dir):
    """Slowly-changing-dimension type 2 built from an event stream:
    collapse each user's consecutive same-event_type runs
    (gaps-and-islands via LAG + running change-count), emit one
    versioned row per run with [valid_from, valid_to) effective range
    and an is_current flag — the dimension-table build step of every
    warehouse load. All windows share ONE partitioning (user_id), so
    Spark plans a single sort+shuffle reused across LAG, the running
    sum, and LEAD. Timestamps are compared at microseconds in both
    engines (CAST in the oracle mirrors Spark's parquet ns->us
    loader), with event_id as the total-order tiebreak."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    seg = e.withColumn(
        "seg_id",
        F.sum(chg).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("bigint"),
    )
    runs = seg.groupBy("user_id", "seg_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    # seg_id tiebreak: two runs can share valid_from when same-µs
    # events with different types split a run — seg_id is the total
    # order (monotone in (ts, event_id) per user).
    w2 = W.partitionBy("user_id").orderBy("valid_from", "seg_id")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_events",
    )


def _profile_sql_row(col: str, kind: str) -> str:
    """One UNION ALL arm of the profiling oracle (kind: num|str|ts):
    the matching typed min/max slot is filled, the others are typed
    NULLs."""
    slots = {
        "num": ("CAST(MIN({c}) AS DOUBLE)", "CAST(MAX({c}) AS DOUBLE)",
                "CAST(NULL AS DOUBLE)"),
        "str": ("MIN({c})", "MAX({c})", "CAST(NULL AS VARCHAR)"),
        "ts": ("MIN({c})", "MAX({c})", "CAST(NULL AS TIMESTAMP)"),
    }
    exprs = []
    for k, (mn, mx, null) in slots.items():
        if k == kind:
            exprs += [mn.format(c=col), mx.format(c=col)]
        else:
            exprs += [null, null]
    return f"""
    SELECT '{col}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           {exprs[0]} AS min_num, {exprs[1]} AS max_num,
           {exprs[2]} AS min_str, {exprs[3]} AS max_str,
           {exprs[4]} AS min_ts, {exprs[5]} AS max_ts
    FROM orders"""


_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


@query(
    "profile_orders_columns",
    oracle=" UNION ALL ".join(_profile_sql_row(c, k) for c, k in _PROFILE_COLS),
)
def profile_orders_columns(spark, sf_dir):
    """Table profiling: one row per column with row/null/exact-distinct
    counts and typed min/max (numeric, string, timestamp slots). The
    data-quality snapshot every ingestion run records. Computed as ONE
    single-pass aggregate (Spark's multi-distinct expand: rows
    duplicate x6 before the partial agg — one scan instead of six;
    the expand factor equals the column count, a fair trade until
    column counts reach the hundreds), then unpivoted map-side via
    inline()."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)

    def arm(c: str, kind: str):
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        null_t = F.lit(None).cast("timestamp")
        mn, mx = F.col(f"{c}__min"), F.col(f"{c}__max")
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (mn.cast("double") if kind == "num" else null_d).alias("min_num"),
            (mx.cast("double") if kind == "num" else null_d).alias("max_num"),
            (mn if kind == "str" else null_s).alias("min_str"),
            (mx if kind == "str" else null_s).alias("max_str"),
            (mn if kind == "ts" else null_t).alias("min_ts"),
            (mx if kind == "ts" else null_t).alias("max_ts"),
        )

    return one.select(
        F.inline(F.array(*[arm(c, k) for c, k in _PROFILE_COLS]))
    )


# --- market-basket association (A-priori first pass) -----------------

ITEM_MIN_ORDERS = 30  # frequent-item support threshold (orders)
PAIR_MIN_ORDERS = 3  # frequent-pair support threshold (orders)


@query(
    "market_basket_pairs",
    oracle=f"""
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    items AS (SELECT l_partkey, COUNT(*) AS item_orders FROM basket GROUP BY 1),
    freq AS (SELECT * FROM items WHERE item_orders >= {ITEM_MIN_ORDERS}),
    fb AS (SELECT b.l_orderkey, b.l_partkey, f.item_orders
           FROM basket b JOIN freq f USING (l_partkey)),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS pair_orders,
             MIN(a.item_orders) AS orders_a, MIN(b.item_orders) AS orders_b
      FROM fb a JOIN fb b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM basket)
    SELECT part_a, part_b, pair_orders,
           ROUND(CAST(pair_orders AS DOUBLE) * n_orders
                 / (orders_a * orders_b), 6) AS lift
    FROM pairs, tot
    WHERE pair_orders >= {PAIR_MIN_ORDERS}
    """,
)
def market_basket_pairs(spark, sf_dir):
    """Frequent co-purchased part pairs with lift — the A-priori first
    pass as one co-partitioned self-join.

    Scale shape (r12 — basket arrays instead of a self-join): (1) ONE
    collect_set shuffle keyed by order folds lineitem to per-order
    part baskets (map-side partial agg replaces the r11 distinct
    shuffle; the r11 plan additionally duplicated the whole
    distinct→count→prune chain under BOTH self-join sides — 26
    Exchanges pre-AQE); the checkpointed basket table then feeds the
    item counts, the order total, and the pair stage without replay.
    (2) The frequent-ITEM prune still runs before the quadratic step
    (A-priori downward closure) as a broadcast of the |parts|-row
    dictionary. (3) The pair blow-up is per-order C(k,2) with k =
    basket size (bounded small in order data) and happens MAP-SIDE as
    an array transform — no join. (4) Item supports ride the pair
    rows as two ints (MIN-folded), so lift needs no second join
    against the counts."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("s"))
        .localCheckpoint(eager=True)
    )
    items = (
        baskets.select(F.explode("s").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("item_orders"))
    )
    freq = items.filter(F.col("item_orders") >= ITEM_MIN_ORDERS)
    fb = (
        baskets.select("l_orderkey", F.explode("s").alias("l_partkey"))
        .join(F.broadcast(freq), "l_partkey")
        .groupBy("l_orderkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_partkey").alias("p"),
                    F.col("item_orders").alias("io"),
                )
            ).alias("fs")
        )
    )
    pairs = (
        fb.select(
            F.explode(
                F.expr(
                    "flatten(transform(fs, x -> transform("
                    "filter(fs, y -> y.p > x.p), "
                    "y -> struct(x.p AS part_a, y.p AS part_b, "
                    "x.io AS ia, y.io AS ib))))"
                )
            ).alias("pr")
        )
        .select("pr.part_a", "pr.part_b", "pr.ia", "pr.ib")
        .groupBy("part_a", "part_b")
        .agg(
            F.count("*").alias("pair_orders"),
            F.min("ia").alias("orders_a"),
            F.min("ib").alias("orders_b"),
        )
        .filter(F.col("pair_orders") >= PAIR_MIN_ORDERS)
    )
    tot = baskets.agg(F.count("*").alias("n_orders"))
    return pairs.crossJoin(F.broadcast(tot)).select(
        "part_a",
        "part_b",
        "pair_orders",
        F.round(
            F.col("pair_orders").cast("double")
            * F.col("n_orders")
            / (F.col("orders_a") * F.col("orders_b")),
            6,
        ).alias("lift"),
    )


@query(
    "event_pattern_match",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             substr(event_type, 1, 1) AS ini
      FROM events),
    j AS (
      SELECT user_id,
             string_agg(ini, '' ORDER BY ts, event_id) AS journey
      FROM ev GROUP BY user_id)
    SELECT user_id, journey, LENGTH(journey) AS n_events,
           CAST(LEN(regexp_extract_all(journey, 'v[^ep]*p')) AS BIGINT)
             AS n_conversions
    FROM j
    """,
)
def event_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-style sequence pattern mining without the
    operator: each user's event stream collapses to a journey STRING
    (one char per event, ordered by ts with an id tiebreak), and the
    pattern 'view, then purchase, with no error or earlier purchase
    between' becomes the regex v[^ep]*p counted non-overlapping.

    Scale shape: one groupBy shuffle; per-user sequences sort INSIDE
    the aggregated array (array_sort on the struct — no window
    machinery), and the regex runs once per user on a compact string.
    At 100 TB per-user journeys are bounded by retention windows; for
    unbounded histories the same journey build shards by (user,
    epoch-week) first."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.substring("event_type", 1, 1).alias("ini"),
    )
    j = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ini"))),
                lambda s: s["ini"],
            ),
            "",
        ).alias("journey")
    )
    return j.select(
        "user_id",
        "journey",
        F.length("journey").cast("bigint").alias("n_events"),
        F.size(F.regexp_extract_all("journey", F.lit("v[^ep]*p"), 0))
        .cast("bigint")
        .alias("n_conversions"),
    )


@query(
    "orders_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT o_orderpriority, EXTRACT(year FROM o_orderdate) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
      FROM orders GROUP BY 1, 2)
    SELECT o_orderpriority, CAST(yr AS BIGINT) AS yr,
           CAST(CAST(rev_dec AS STRING) AS DOUBLE) AS revenue,
           ROUND((CAST(CAST(rev_dec AS STRING) AS DOUBLE)
                  - CAST(CAST(LAG(rev_dec) OVER w AS STRING) AS DOUBLE))
                 / CAST(CAST(LAG(rev_dec) OVER w AS STRING) AS DOUBLE), 6) AS yoy_growth
    FROM yearly
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY yr)
    """,
)
def orders_yoy_growth(spark, sf_dir):
    """Year-over-year revenue growth per priority — the canonical
    time-comparative BI shape. Yearly totals stay DECIMAL (exact,
    associative) through the aggregation AND through the LAG; the only
    float op is one growth division per (priority, year) row, rounded
    to 6. Scale: the window runs over the AGGREGATED year table
    (O(priorities x years) rows), never the fact scan."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    ).agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    w = W.partitionBy("o_orderpriority").orderBy("yr")
    prev = F.lag("rev_dec").over(w)
    return yearly.select(
        "o_orderpriority",
        F.col("yr").cast("bigint").alias("yr"),
        F.col("rev_dec").cast("double").alias("revenue"),
        F.round(
            (F.col("rev_dec").cast("double") - prev.cast("double"))
            / prev.cast("double"),
            6,
        ).alias("yoy_growth"),
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH agg AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary_dec
      FROM orders GROUP BY 1)
    SELECT o_custkey,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(CAST(monetary_dec AS STRING) AS DOUBLE) AS monetary,
           NTILE(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
           NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
           NTILE(5) OVER (ORDER BY monetary_dec, o_custkey) AS m_score
    FROM agg
    """,
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation — recency/frequency/monetary quintiles per
    customer, the marketing-analytics staple. Determinism: every
    NTILE rides a TOTAL order (metric, then custkey tiebreak), so
    bucket boundaries cannot differ between engines or partitionings;
    monetary accumulates in decimal. Scale: one groupBy shuffle over
    orders, then three windows over the per-customer table; at 100 TB
    the NTILE's single-partition sort runs over |customers| rows —
    replace with percentile-bucket joins if even that is too wide."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(dec("o_totalprice")).alias("monetary_dec"),
    )
    return agg.select(
        "o_custkey",
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("monetary_dec").cast("double").alias("monetary"),
        F.ntile(5)
        .over(W.orderBy("last_order", "o_custkey"))
        .alias("r_score"),
        F.ntile(5).over(W.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(5)
        .over(W.orderBy("monetary_dec", "o_custkey"))
        .alias("m_score"),
    )


@query(
    "event_path_trigrams_topk",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             substr(event_type, 1, 1) AS ini
      FROM events),
    tri AS (
      SELECT ini || LEAD(ini, 1) OVER w || LEAD(ini, 2) OVER w AS trigram
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT trigram, COUNT(*) AS n
    FROM tri WHERE trigram IS NOT NULL
    GROUP BY trigram
    ORDER BY n DESC, trigram
    LIMIT 10
    """,
)
def event_path_trigrams_topk(spark, sf_dir):
    """Path mining: the 10 most common 3-event journeys across all
    users (event types as initials, user-ordered by time). The trigram
    build is two LEADs over ONE shared window sort per user — no
    collect, no explode — then a bounded global count; top-k plans as
    TakeOrderedAndProject (constant driver memory). The classic 'what
    do users do next' analysis at scan-plus-one-window cost."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.substring("event_type", 1, 1).alias("ini"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = F.concat(
        F.col("ini"), F.lead("ini", 1).over(w), F.lead("ini", 2).over(w)
    )
    return (
        ev.select(tri.alias("trigram"))
        .filter(F.col("trigram").isNotNull())
        .groupBy("trigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(10)
    )


@query(
    "attribution_last_touch",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type, value,
             CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_type IN ('click', 'view') THEN event_type END
               AS touch
      FROM events),
    carried AS (
      SELECT *,
             LAST_VALUE(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      FROM ev)
    SELECT COALESCE(last_touch, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS attributed_value
    FROM carried
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: every purchase is credited
    to the user's most recent preceding marketing touch (click/view);
    purchases with no prior touch are 'direct'. The per-channel report
    (count + attributed revenue) is what funds marketing budgets.

    ONE window pass does the whole credit assignment: the touch column
    is NULL except on touch events, and last_value(IGNORE NULLS) over
    [unbounded, 1 preceding) carries the latest touch onto each
    purchase — the same union-sort LOCF shape as the as-of join
    (operators/asof.py) but fused into the event stream itself, so no
    join and exactly one shuffle keyed by user_id. (ts, event_id)
    makes the ordering total; revenue sums in exact decimal."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ).alias("touch"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = ev.withColumn(
        "last_touch", F.last("touch", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("last_touch"), F.lit("direct")).alias("channel")
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(dec("value")).cast("double").alias("attributed_value"),
        )
    )


@query(
    "table_expectations_orders",
    oracle="""
    WITH scan AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
               AS null_pk,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS dup_pk,
             CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F'))
                  AS BIGINT) AS bad_status,
             CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
               AS nonpos_price,
             CAST(COUNT(*) FILTER (
               WHERE o_orderdate > TIMESTAMP '2002-01-01') AS BIGINT)
               AS future_date
      FROM orders),
    orphans AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)),
    checks AS (
      SELECT 'pk_not_null' AS check_name, null_pk AS n_violations FROM scan
      UNION ALL SELECT 'pk_unique', dup_pk FROM scan
      UNION ALL SELECT 'status_accepted_values', bad_status FROM scan
      UNION ALL SELECT 'price_positive', nonpos_price FROM scan
      UNION ALL SELECT 'date_not_future', future_date FROM scan
      UNION ALL SELECT 'custkey_fk_customer', n FROM orphans)
    SELECT check_name, n_violations,
           CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS verdict
    FROM checks
    """,
)
def table_expectations_orders(spark, sf_dir):
    """A dbt-test / Great-Expectations-style data-contract report for
    the orders table, produced the way it must be at 100 TB: ONE
    conditional-aggregate scan covers not-null, uniqueness,
    accepted-values, range, and freshness checks simultaneously
    (six counters in a single partial-agg pass — not six scans), and
    the referential check is one LEFT ANTI join against the broadcast
    customer keys. Output is one row per check with a violation count
    and verdict — the artifact a pipeline gates deploys on.
    ('P' is deliberately outside the accepted status set so the
    fixture exercises a failing check alongside passing ones.)"""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    scan = o.agg(
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("null_pk"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_pk"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F"), 1)
        ).alias("bad_status"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpos_price"),
        F.count(
            F.when(
                F.col("o_orderdate") > F.lit("2002-01-01").cast("timestamp"), 1
            )
        ).alias("future_date"),
    )
    orphans = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti"
    ).agg(F.count("*").alias("n"))
    labeled = [
        ("pk_not_null", scan, "null_pk"),
        ("pk_unique", scan, "dup_pk"),
        ("status_accepted_values", scan, "bad_status"),
        ("price_positive", scan, "nonpos_price"),
        ("date_not_future", scan, "future_date"),
        ("custkey_fk_customer", orphans, "n"),
    ]
    checks = None
    for name, src, col in labeled:
        row = src.select(
            F.lit(name).alias("check_name"), F.col(col).alias("n_violations")
        )
        checks = row if checks is None else checks.unionByName(row)
    return checks.select(
        "check_name",
        "n_violations",
        F.when(F.col("n_violations") == 0, "pass").otherwise("fail").alias("verdict"),
    )


# Z-order (Morton) interleave of two 8-bit keys as a DuckDB SQL
# expression — built once so the oracle text and the docstring agree
# on the exact bit layout (k1 occupies the ODD bit positions).
_MORTON_SQL = " + ".join(
    f"((({{k1}} >> {i}) & 1) << {2 * i + 1})"
    f" + ((({{k2}} >> {i}) & 1) << {2 * i})"
    for i in range(8)
)


def _morton_col(k1, k2):
    """The same interleave as _MORTON_SQL, as JVM-side Column
    arithmetic (shiftright/shiftleft + bitwiseAND — no UDF)."""
    out = F.lit(0)
    for i in range(8):
        out = out + F.shiftleft(
            F.shiftright(k1, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ) + F.shiftleft(
            F.shiftright(k2, i).bitwiseAND(F.lit(1)), 2 * i
        )
    return out


@query(
    "zorder_layout_plan",
    oracle=f"""
    WITH keys AS (
      SELECT (o_custkey % 256) AS k1,
             CAST(datediff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE)) AS INT) % 256 AS k2
      FROM orders),
    z AS (
      SELECT k1, k2,
             ({_MORTON_SQL.format(k1="k1", k2="k2")}) AS morton
      FROM keys),
    both_layouts AS (
      SELECT 'zorder' AS layout, morton >> 10 AS bucket, k1, k2 FROM z
      UNION ALL
      SELECT 'datesort' AS layout, k2 >> 2 AS bucket, k1, k2 FROM z)
    SELECT layout,
           CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(k1) AS INT) AS min_cust,
           CAST(MAX(k1) AS INT) AS max_cust,
           CAST(MIN(k2) AS INT) AS min_day,
           CAST(MAX(k2) AS INT) AS max_day,
           CAST(MAX(k1) - MIN(k1) + 1 AS INT) AS cust_span,
           CAST(MAX(k2) - MIN(k2) + 1 AS INT) AS day_span
    FROM both_layouts
    GROUP BY layout, bucket
    """,
)
def zorder_layout_plan(spark, sf_dir):
    """Multi-dimensional clustering layout planning — the OPTIMIZE
    ZORDER BY pass of a lakehouse table: interleave the bits of two
    query-predicate keys (customer, order day — each folded to 8
    bits) into a 16-bit Morton code, assign rows to 64 output buckets
    by Morton RANGE, and emit each bucket's per-column zone map
    (min/max of BOTH dimensions) next to the same audit for the
    single-column date-sorted layout. The point the numbers make: a
    Morton bucket of 1024 codes covers a 32x32 cell of the key grid,
    so BOTH columns' spans stay bounded (~32/256) and min/max file
    skipping prunes on either predicate — while the date-sorted
    layout gives day_span ~4 but cust_span ~256, so customer
    predicates scan every file. This is the planning artifact: the
    bucket stats ARE the zone maps a writer would persist. It
    completes the layout trilogy: `zorder_morton_keys` emits the
    per-row clustering key, `zone_map_pruning_audit` measures an
    EXISTING layout's skipping, and this query PLANS the z-ordered
    layout — per-bucket zone maps plus the quantified case against
    single-column sort (write_partition_plan's sibling for the
    multi-predicate case).

    Engine shape: the Morton code is pure JVM bit arithmetic
    (shiftleft/shiftright/AND — no UDF, stays in whole-stage
    codegen); one partial-aggregated groupBy per layout, key space
    bounded at 64 buckets regardless of table size; at 100 TB this is
    the same map-side-combine-then-tiny-shuffle class as
    write_partition_plan, and the Morton expression doubles as the
    repartitionByRange key for actually WRITING the layout."""
    o = load_table(spark, sf_dir, "orders")
    k1 = (F.col("o_custkey") % 256).cast("int")
    k2 = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        % 256
    ).cast("int")
    keys = o.select(k1.alias("k1"), k2.alias("k2"))
    z = keys.withColumn("morton", _morton_col(F.col("k1"), F.col("k2")))
    zorder = z.select(
        F.lit("zorder").alias("layout"),
        F.shiftright("morton", 10).cast("int").alias("bucket"),
        "k1", "k2",
    )
    datesort = z.select(
        F.lit("datesort").alias("layout"),
        F.shiftright("k2", 2).cast("int").alias("bucket"),
        "k1", "k2",
    )
    return (
        zorder.unionAll(datesort)
        .groupBy("layout", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("k1").cast("int").alias("min_cust"),
            F.max("k1").cast("int").alias("max_cust"),
            F.min("k2").cast("int").alias("min_day"),
            F.max("k2").cast("int").alias("max_day"),
            (F.max("k1") - F.min("k1") + 1).cast("int").alias("cust_span"),
            (F.max("k2") - F.min("k2") + 1).cast("int").alias("day_span"),
        )
    )


# Single-column probe ranges for the EXECUTED-layout audit: one pair
# per dimension, each 16/256 of the key domain, so a well-clustered
# layout should admit ~1/16 of the files on either predicate.
_ZX_PROBES = (
    ("cust", 32, 47),
    ("cust", 160, 175),
    ("day", 96, 111),
    ("day", 200, 215),
)


def rewrite_orders_layouts(spark, sf_dir, root):
    """Perform the two clustering rewrites of orders under ``root``
    and return {layout: re-read DataFrame}. Split out of
    `zorder_layout_execute` so tests/test_plans.py can pin the
    re-read scan's PushedFilters on the files the rewrite produced."""
    o = load_table(spark, sf_dir, "orders")
    k1 = (F.col("o_custkey") % 256).cast("int")
    k2 = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        % 256
    ).cast("int")
    keys = o.select(
        "o_orderkey", k1.alias("k1"), k2.alias("k2")
    ).withColumn("morton", _morton_col(F.col("k1"), F.col("k2")))
    layouts = {
        "zorder": F.shiftright("morton", 10).cast("int"),
        "datesort": F.shiftright("k2", 2).cast("int"),
    }
    # r12: BOTH rewrites in ONE write job — union the two layouts
    # under a `layout` partition column and shuffle once on
    # (layout, zbucket), halving the job/commit count (the commit of
    # 64 tiny partition dirs was a fixed per-job cost as large as the
    # data write at this geometry). Still exactly one data file per
    # (layout, zbucket): partitionBy splits each task's rows per
    # directory, exactly as the two separate writes did.
    both = None
    for layout, bucket in layouts.items():
        part = keys.withColumn("zbucket", bucket).withColumn(
            "layout", F.lit(layout)
        )
        both = part if both is None else both.unionAll(part)
    (
        both.repartition(64, "layout", "zbucket")
        .write.partitionBy("layout", "zbucket")
        .mode("overwrite")
        .parquet(root)
    )
    return {
        layout: spark.read.parquet(f"{root}/layout={layout}")
        for layout in layouts
    }


@query(
    "zorder_layout_execute",
    oracle=f"""
    WITH keys AS (
      SELECT (o_custkey % 256) AS k1,
             CAST(datediff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE)) AS INT) % 256 AS k2
      FROM orders),
    z AS (
      SELECT k1, k2,
             ({_MORTON_SQL.format(k1="k1", k2="k2")}) AS morton
      FROM keys),
    both_layouts AS (
      SELECT 'zorder' AS layout, morton >> 10 AS bucket, k1, k2 FROM z
      UNION ALL
      SELECT 'datesort' AS layout, k2 >> 2 AS bucket, k1, k2 FROM z),
    zones AS (
      SELECT layout, bucket,
             MIN(k1) AS mn1, MAX(k1) AS mx1,
             MIN(k2) AS mn2, MAX(k2) AS mx2
      FROM both_layouts GROUP BY 1, 2),
    probes(dim, lo, hi) AS (VALUES {", ".join(f"('{d}', {lo}, {hi})" for d, lo, hi in _ZX_PROBES)}),
    scan AS (
      SELECT z.layout, p.dim, CAST(p.lo AS INT) AS lo, CAST(p.hi AS INT) AS hi,
             CAST(COUNT(*) FILTER (WHERE
               (p.dim = 'cust' AND z.mx1 >= p.lo AND z.mn1 <= p.hi) OR
               (p.dim = 'day'  AND z.mx2 >= p.lo AND z.mn2 <= p.hi))
               AS BIGINT) AS files_scanned,
             CAST(COUNT(*) AS BIGINT) AS files_total
      FROM probes p CROSS JOIN zones z
      GROUP BY 1, 2, 3, 4),
    matched AS (
      SELECT p.dim, CAST(p.lo AS INT) AS lo,
             CAST(COUNT(*) FILTER (WHERE
               (p.dim = 'cust' AND k.k1 BETWEEN p.lo AND p.hi) OR
               (p.dim = 'day'  AND k.k2 BETWEEN p.lo AND p.hi))
               AS BIGINT) AS rows_matched
      FROM probes p CROSS JOIN keys k
      GROUP BY 1, 2)
    SELECT s.layout, s.dim, s.lo, s.hi, s.files_scanned, s.files_total,
           m.rows_matched
    FROM scan s JOIN matched m ON s.dim = m.dim AND s.lo = m.lo
    """,
)
def zorder_layout_execute(spark, sf_dir):
    """OPTIMIZE ZORDER, the EXECUTION half (VERDICT r11 #5):
    `zorder_layout_plan` emits the zone maps a z-ordered rewrite
    WOULD produce; this query actually performs the rewrite and
    audits the files on disk. Orders rows get the same 16-bit Morton
    key over (customer % 256, order-day % 256); the table is
    REWRITTEN twice as parquet — once clustered by Morton bucket
    (morton >> 10, the z-order layout), once by day bucket (k2 >> 2,
    the single-column date sort a naive pipeline writes) — each
    hash-repartitioned on its bucket before a partitionBy write so
    every bucket lands in EXACTLY one data file. The audit then
    RE-READS the rewritten files, rebuilds each file's zone map
    (min/max of both key columns, exactly the parquet footer stats a
    reader consults), and reports per single-column probe how many
    FILES each layout must scan: z-order admits ~1/16 of the files
    on EITHER predicate; date-sort admits ~1/16 on day but ~16/16 on
    customer. rows_matched is counted from literal-predicate scans
    of the rewritten files (filters pushed to parquet,
    tests/test_plans.py pins PushedFilters), proving the rewrite
    preserved the data.

    Engine shape at 100 TB: the rewrite is OPTIMIZE's cost — ONE
    bounded shuffle of the table on the bucket key, then a map-side
    write (in production, repartitionByRange on the raw Morton code
    with a row-count target per file replaces the fixed 64 buckets);
    the audit side is O(files) zone-map rows, broadcast against a
    4-row literal probe table. Temp artifacts live for the call only:
    the verdict DataFrame is localCheckpoint-ed off the files before
    the directory is removed, the run_cdc_upsert discipline."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="spark_graft_zorder_")
    try:
        parts = []
        for layout, rewritten in rewrite_orders_layouts(
            spark, sf_dir, root
        ).items():
            zones = rewritten.groupBy("zbucket").agg(
                F.min("k1").alias("mn1"), F.max("k1").alias("mx1"),
                F.min("k2").alias("mn2"), F.max("k2").alias("mx2"),
            )
            probes = spark.createDataFrame(
                list(_ZX_PROBES), "dim string, lo int, hi int"
            )
            admit = F.when(
                F.col("dim") == "cust",
                (F.col("mx1") >= F.col("lo")) & (F.col("mn1") <= F.col("hi")),
            ).otherwise(
                (F.col("mx2") >= F.col("lo")) & (F.col("mn2") <= F.col("hi"))
            )
            scan = (
                F.broadcast(probes)
                .crossJoin(zones)
                .groupBy("dim", "lo", "hi")
                .agg(
                    F.sum(admit.cast("bigint")).alias("files_scanned"),
                    F.count("*").alias("files_total"),
                )
            )
            # rows_matched per probe from literal-predicate re-reads:
            # each count is its own parquet scan with the range pushed
            # down to the footer level (the skip the audit quantifies).
            matched = None
            for dim, lo, hi in _ZX_PROBES:
                col = "k1" if dim == "cust" else "k2"
                one = (
                    rewritten.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
                    .agg(F.count("*").alias("rows_matched"))
                    .select(
                        F.lit(dim).alias("dim"),
                        F.lit(lo).alias("lo"),
                        F.col("rows_matched"),
                    )
                )
                matched = one if matched is None else matched.unionAll(one)
            parts.append(
                scan.join(matched, ["dim", "lo"]).select(
                    F.lit(layout).alias("layout"),
                    "dim", "lo", "hi",
                    "files_scanned", "files_total", "rows_matched",
                )
            )
        return parts[0].unionAll(parts[1]).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
