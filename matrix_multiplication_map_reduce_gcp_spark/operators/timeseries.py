"""Time-series monitoring operators over the events table: per-type
hourly-volume anomaly detection (z-scores from exact integer power
sums) and interval-weighted value averaging (exact decimal×µs
segment weights).

Determinism: counts and epoch-microsecond gaps are integers; every
double is derived from integers through a textually identical
formula in both engines, and z/twa outputs are rounded to 6 digits.
Zero-variance groups are excluded with an exact INTEGER predicate
(nh*s2 - s1² > 0), never a float comparison, so no inf/NaN division
reaches the output (Spark NULLs double-div-by-zero, DuckDB emits
inf — the one divergence this formula must avoid).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

Z_THRESHOLD = 2.0


@query(
    "hourly_count_anomalies",
    oracle=f"""
    WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
    hc AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
    st AS (
      SELECT event_type, COUNT(*) AS nh,
             CAST(SUM(n) AS BIGINT) AS s1,
             CAST(SUM(n * n) AS BIGINT) AS s2
      FROM hc GROUP BY 1)
    SELECT hc.event_type, hc.hour_ts, hc.n,
           ROUND((hc.n - CAST(st.s1 AS DOUBLE) / st.nh)
                 / sqrt((CAST(st.s2 AS DOUBLE)
                         - CAST(st.s1 AS DOUBLE) * (CAST(st.s1 AS DOUBLE) / st.nh))
                        / (st.nh - 1)), 6) AS zscore
    FROM hc JOIN st USING (event_type)
    WHERE st.nh >= 2 AND st.nh * st.s2 - st.s1 * st.s1 > 0
      AND ABS(ROUND((hc.n - CAST(st.s1 AS DOUBLE) / st.nh)
                 / sqrt((CAST(st.s2 AS DOUBLE)
                         - CAST(st.s1 AS DOUBLE) * (CAST(st.s1 AS DOUBLE) / st.nh))
                        / (st.nh - 1)), 6)) >= {Z_THRESHOLD}
    """,
)
def hourly_count_anomalies(spark, sf_dir):
    """Volume-anomaly monitor: hours whose event count deviates ≥2
    sample standard deviations from that event_type's hourly mean.

    Shape: one (type, hour) count aggregation, then a tiny per-type
    stats row (n, Σn, Σn²) broadcast back onto the hourly counts —
    the same one-extra-reduce pattern as stats_price_moments. At
    100 TB the hourly grid stays small (types × hours), so the
    anomaly join never touches raw events twice."""
    e = load_table(spark, sf_dir, "events")
    hc = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count("*").alias("n"))
    st = hc.groupBy("event_type").agg(
        F.count("*").alias("nh"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    mean = s1d / F.col("nh")
    var = (F.col("s2").cast("double") - s1d * mean) / (F.col("nh") - 1)
    z = F.round((F.col("n") - mean) / F.sqrt(var), 6)
    return (
        hc.join(F.broadcast(st), "event_type")
        .filter(
            (F.col("nh") >= 2)
            & (F.col("nh") * F.col("s2") - F.col("s1") * F.col("s1") > 0)
        )
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= Z_THRESHOLD)
        .select("event_type", "hour_ts", "n", "zscore")
    )


@query(
    "time_weighted_value",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events),
    seq AS (
      SELECT user_id, value, epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_us
      FROM e),
    seg AS (
      SELECT user_id,
             CAST(ROUND(value, 6) AS DECIMAL(18,6)) * (next_us - t_us) AS wv,
             next_us - t_us AS dt
      FROM seq WHERE next_us IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dt) AS BIGINT) AS total_us,
           ROUND(CAST(CAST(SUM(wv) AS STRING) AS DOUBLE) / CAST(SUM(dt) AS BIGINT), 6)
             AS twa_value
    FROM seg GROUP BY 1
    """,
)
def time_weighted_value(spark, sf_dir):
    """Time-weighted average of the event value per user: each value
    holds until the user's next event, so segments weight by their
    µs duration — the correct mean for irregularly sampled gauges
    (LOCF integral / elapsed time).

    Exactness: weights are DECIMAL(18,6)·BIGINT products (exact, so
    the SUM is order-independent), divided once at the end. Shape:
    one window per user partition + one aggregation — same shuffle
    key, so Catalyst reuses the partitioning; scales as pure
    per-user streams."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = e.select(
        "user_id",
        "value",
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("next_us"),
    )
    dt = F.col("next_us") - F.col("t_us")
    seg = seq.filter(F.col("next_us").isNotNull()).select(
        "user_id",
        (F.round("value", 6).cast("decimal(18,6)") * dt).alias("wv"),
        dt.alias("dt"),
    )
    return seg.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.sum("dt").alias("total_us"),
        F.round(
            F.sum("wv").cast("double") / F.sum("dt").cast("bigint"), 6
        ).alias("twa_value"),
    )


# --- interval-overlap join (incident attribution) --------------------

INCIDENT_US = 600 * 1_000_000  # 10-minute incident window


@query(
    "incident_impact_events",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events)
    SELECT e.event_id AS error_id,
           COUNT(i.event_id) AS n_impacted,
           COUNT(DISTINCT i.user_id) AS n_users
    FROM ev e LEFT JOIN ev i
      ON i.event_type IN ('view', 'click')
     AND i.ts >= e.ts AND i.ts < e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY 1
    """,
)
def incident_impact_events(spark, sf_dir):
    """Interval-overlap join: every error event opens a 10-minute
    incident window; count the view/click events (and distinct users)
    falling inside each window, across ALL users — zero-impact
    incidents included.

    The oracle is the naive theta-join; the Spark plan is the SCALABLE
    interval-join shape: both sides are bucketed to 10-minute epoch
    bins (integer DIV — float division can cross a floor boundary at
    epoch-microsecond magnitudes), each incident expands to the <=2
    bins its window touches, and the match becomes a bin EQUI-join +
    exact residual predicate. Candidate blow-up is bounded by time
    density per bin, never |errors| x |events|."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("s_us"),
    )
    cand = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("impact_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("c_us"),
        F.expr(f"unix_micros(ts) DIV {INCIDENT_US}").alias("bin"),
    )
    binned = err.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"s_us DIV {INCIDENT_US}"),
                F.expr(f"(s_us + {INCIDENT_US} - 1) DIV {INCIDENT_US}"),
            )
        ),
    )
    hits = binned.join(cand, "bin").filter(
        (F.col("c_us") >= F.col("s_us"))
        & (F.col("c_us") < F.col("s_us") + INCIDENT_US)
    )
    agg = hits.groupBy("error_id").agg(
        F.count("*").alias("hit_n"),
        F.countDistinct("user_id").alias("hit_users"),
    )
    return err.select("error_id").join(agg, "error_id", "left").select(
        "error_id",
        F.coalesce(F.col("hit_n"), F.lit(0)).alias("n_impacted"),
        F.coalesce(F.col("hit_users"), F.lit(0)).alias("n_users"),
    )


@query(
    "event_change_points",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts
      FROM events),
    marked AS (
      SELECT event_id, user_id, value,
             LAG(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
      FROM ev)
    SELECT event_id, user_id, value
    FROM marked
    WHERE prev IS NULL OR value != prev
    """,
)
def event_change_points(spark, sf_dir):
    """Change-capture / delta compression for time-series: keep only
    the rows where a user's value CHANGED from the previous reading
    (plus each user's first row). This is the storage-side dual of
    LOCF — at 100 TB of sensor-style data the kept fraction is the
    true information rate, and downstream LOCF reconstructs the
    original exactly. One window shuffle on the user key; ordering
    ties break on event_id, and the oracle orders over the µs-cast ts
    so nanosecond fixtures agree with Spark's µs loader."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return (
        ev.select("event_id", "user_id", "value", prev.alias("prev"))
        .filter(F.col("prev").isNull() | (F.col("value") != F.col("prev")))
        .select("event_id", "user_id", "value")
    )
