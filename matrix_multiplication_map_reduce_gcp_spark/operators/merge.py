"""MERGE / upsert emulation (SCD-style) without Delta: anti-join +
union, the portable formulation (the Delta/Iceberg jars aren't in this
container; with them this becomes ``MERGE INTO``).

Semantics: rows in `source` update matching `target` rows (by key) and
insert the rest; unmatched target rows pass through — i.e. SQL MERGE
with WHEN MATCHED UPDATE + WHEN NOT MATCHED INSERT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable_hash import sql_hash32_unsalted
from ..registry import query


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """UPDATE-or-INSERT source into target on `key` (columns must
    match). One anti-join + one union — no full rewrite of unmatched
    data beyond the union scan."""
    untouched = target.join(source, key, "left_anti")
    return untouched.unionByName(source)


@query(
    "merge_upsert_orders",
    oracle="""
    WITH source AS (
      SELECT o_orderkey, o_custkey, 'P' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(4,2)) AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0)
    SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice,
           t.o_orderdate, t.o_orderpriority
    FROM orders t LEFT JOIN source s ON t.o_orderkey = s.o_orderkey
    WHERE s.o_orderkey IS NULL
    UNION ALL
    SELECT * FROM source
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """Upsert a derived change-set (10% of orders re-priced, status→P)
    into the orders snapshot — the CDC/SCD maintenance shape."""
    t = load_table(spark, sf_dir, "orders")
    source = t.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("P").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(12,2)") * F.lit(1.1).cast("decimal(4,2)"))
        .cast("double")
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    return merge_upsert(t, source, "o_orderkey")


# Portable row fingerprint columns for the CDC diff: strings/ints
# only — doubles and timestamps render engine-specifically inside
# md5(concat(...)), integers and plain strings do not.
_FP = "CONCAT(o_orderstatus, '|', CAST(o_custkey AS VARCHAR), '|', o_orderpriority)"
_COIN = sql_hash32_unsalted("o_orderkey")


@query(
    "snapshot_diff_orders",
    oracle=f"""
    WITH h AS (
      SELECT o_orderkey,
             {_COIN} % 20 AS coin,
             o_orderstatus, o_custkey, o_orderpriority
      FROM orders),
    yesterday AS (
      SELECT o_orderkey,
             md5(CONCAT(CASE WHEN coin = 0 THEN 'X' ELSE o_orderstatus END,
                        '|', CAST(o_custkey AS VARCHAR), '|', o_orderpriority)) AS fp
      FROM h WHERE coin != 1),
    today AS (
      SELECT o_orderkey, md5({_FP}) AS fp
      FROM h WHERE coin != 2)
    SELECT CASE WHEN y.o_orderkey IS NULL THEN 'inserted'
                WHEN t.o_orderkey IS NULL THEN 'deleted'
                WHEN y.fp != t.fp THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           COUNT(*) AS n
    FROM yesterday y FULL OUTER JOIN today t USING (o_orderkey)
    GROUP BY 1
    """,
)
def snapshot_diff_orders(spark, sf_dir):
    """CDC snapshot diff: classify every key across two table
    snapshots as inserted / deleted / changed / unchanged by comparing
    ROW FINGERPRINTS (md5 over the tracked columns), never column by
    column — at 100 TB the diff shuffles (key, 16-byte hash), not the
    rows. One full-outer co-partitioned join on the key; the output is
    the 4-row summary a reconciliation job alerts on.

    The two snapshots are derived deterministically from the orders
    fixture with the portable hash coin (coin=0 rows differ, coin=1
    missing yesterday => inserted, coin=2 missing today => deleted),
    so the oracle sees bit-identical inputs."""
    from ..functions.portable_hash import hash32_unsalted

    o = load_table(spark, sf_dir, "orders")
    h = o.select(
        "o_orderkey",
        (hash32_unsalted(F.col("o_orderkey")) % 20).alias("coin"),
        "o_orderstatus",
        "o_custkey",
        "o_orderpriority",
    )
    fp_today = F.md5(
        F.concat(
            F.col("o_orderstatus"),
            F.lit("|"),
            F.col("o_custkey").cast("string"),
            F.lit("|"),
            F.col("o_orderpriority"),
        )
    )
    fp_yest = F.md5(
        F.concat(
            F.when(F.col("coin") == 0, "X").otherwise(F.col("o_orderstatus")),
            F.lit("|"),
            F.col("o_custkey").cast("string"),
            F.lit("|"),
            F.col("o_orderpriority"),
        )
    )
    yesterday = h.filter(F.col("coin") != 1).select(
        "o_orderkey", fp_yest.alias("fp_y")
    )
    today = h.filter(F.col("coin") != 2).select(
        "o_orderkey", fp_today.alias("fp_t")
    )
    j = yesterday.join(today, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("fp_y").isNull(), "inserted")
        .when(F.col("fp_t").isNull(), "deleted")
        .when(F.col("fp_y") != F.col("fp_t"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(change.alias("change_type")).agg(F.count("*").alias("n"))
