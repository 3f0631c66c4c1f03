"""Skew mitigation: salted two-phase aggregation, plus bucketed
co-located joins (SURVEY.md §7 "100 TB-mindedness": salted keys for
skewed grouping; bucketing for shuffle-free repeat joins).

Salting splits each hot key into `n_salts` subkeys for the first
(partial) aggregation, then re-aggregates the partials — the classic
two-phase rewrite. Results are identical to the direct aggregation
because the aggregates used are reassociable (counts + decimal sums),
which is also why the DuckDB oracle is just the PLAIN group-by."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dec
from ..registry import query


def salted_sum_count(
    df: DataFrame,
    key: str,
    sum_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: (key) → exact decimal sum +
    count, routed through (key, salt) partials."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(sum_col).alias("__psum"), F.count("*").alias("__pcnt")
    )
    return partial.groupBy(key).agg(
        F.sum("__psum").alias("__sum"), F.sum("__pcnt").alias("n")
    ).select(key, F.col("__sum").alias("sum_dec"), "n")


@query(
    "skew_salted_status_totals",
    oracle="""
    SELECT o_orderstatus, CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def skew_salted_status_totals(spark, sf_dir):
    """o_orderstatus has 3 heavily-skewed values — the salted two-phase
    aggregation must produce the identical exact result as the plain
    group-by the oracle runs."""
    o = load_table(spark, sf_dir, "orders")
    out = salted_sum_count(o, "o_orderstatus", dec("o_totalprice"))
    return out.select(
        "o_orderstatus", F.col("sum_dec").cast("double").alias("total"), "n"
    )


@query(
    "skew_salted_hot_key_join",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_pairs,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS qty
    FROM lineitem l JOIN (SELECT DISTINCT l_returnflag AS rf FROM lineitem) d
      ON l.l_returnflag = d.rf
    GROUP BY l_returnflag
    """,
)
def skew_salted_hot_key_join(spark, sf_dir):
    """Hot-key join salted by hand: the 3-value join key would put all
    rows in 3 tasks; replicating the small side across n_salts and
    salting the big side restores parallelism. (AQE's skew-join does
    this automatically for sort-merge joins; the manual rewrite is the
    portable fallback and the thing you need for hash-partitioned
    aggregations.)"""
    n_salts = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    dim = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("rf"))
        .distinct()
        .crossJoin(
            F.broadcast(
                li.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
            )
        )
    )
    joined = li.join(F.broadcast(dim), (li.l_returnflag == dim.rf) & (li["__salt"] == dim["__salt"]))
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_pairs"),
        F.sum(dec("l_quantity")).cast("double").alias("qty"),
    )


@query(
    "shuffle_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY 1),
    summary AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n_rows) AS BIGINT) AS total_rows,
             CAST(MAX(n_rows) AS BIGINT) AS max_key_rows
      FROM per_key),
    top AS (
      SELECT key, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS rn
      FROM per_key)
    SELECT t.key, t.n_rows, CAST(t.rn AS INT) AS rank,
           s.n_keys, s.total_rows, s.max_key_rows,
           CAST(s.max_key_rows AS DOUBLE) * s.n_keys / s.total_rows
             AS imbalance_factor
    FROM top t CROSS JOIN summary s
    WHERE t.rn <= 10
    """,
)
def shuffle_skew_report(spark, sf_dir):
    """Pre-flight skew diagnosis for a planned shuffle key — the
    report you run BEFORE a 100 TB join to decide between plain
    hash-join, AQE skew splitting, and manual salting: per-key row
    counts, the top-10 heaviest keys, and the imbalance factor
    max·|keys|/total (1.0 = perfectly uniform; the factor is how many
    times longer the straggler partition runs than the average).

    One map-side-combinable count per key, a TakeOrderedAndProject
    top-10 (per-partition heaps, no global sort), and a 3-scalar
    summary broadcast onto the 10 surviving rows. This operator is
    the measured justification for the repo's salting thresholds
    (skew_salted_hot_key_join, skew_salted_status_totals)."""
    li = load_table(spark, sf_dir, "lineitem")
    return skew_report(li, "l_orderkey")


def skew_report(df: DataFrame, key: str) -> DataFrame:
    """Per-key skew diagnosis for an arbitrary frame + shuffle key:
    top-10 heaviest keys, key/row totals, and the imbalance factor
    max·|keys|/total. The generic seam behind shuffle_skew_report —
    tests/test_plans.py runs it against the fixture's worst natural
    key (events.user_id) and against a planted 10%-hot-key
    distribution to pin that the diagnosis (imbalance factor) and the
    mitigation (AQE skew-join split) actually connect."""
    per_key = df.groupBy(F.col(key).alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    summary = per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
        F.max("n_rows").alias("max_key_rows"),
    )
    top = per_key.orderBy(F.desc("n_rows"), "key").limit(10)
    from pyspark.sql import Window as W

    ranked = top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("n_rows"), "key"))
    )
    return ranked.crossJoin(F.broadcast(summary)).select(
        "key",
        "n_rows",
        "rank",
        "n_keys",
        F.col("total_rows").cast("long").alias("total_rows"),
        "max_key_rows",
        (
            F.col("max_key_rows").cast("double")
            * F.col("n_keys")
            / F.col("total_rows")
        ).alias("imbalance_factor"),
    )
