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
