"""Set operations: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT.

The reference's merge of A-mapper and B-mapper outputs was an implicit
UNION ALL (reference orchestrator/main.py:121-126); the rest were
absent (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _seg(spark, sf_dir, seg):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == seg)
        .select("c_custkey", "c_nationkey")
    )


@query(
    "union_all_segments",
    oracle="""
    SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def union_all_segments(spark, sf_dir):
    return _seg(spark, sf_dir, "BUILDING").union(_seg(spark, sf_dir, "MACHINERY"))


@query(
    "union_distinct_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct_nations(spark, sf_dir):
    c = _seg(spark, sf_dir, "BUILDING").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@query(
    "intersect_open_and_filled",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_open_and_filled(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(filled)


@query(
    "except_only_open",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_only_open(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(filled)  # EXCEPT (distinct) semantics


@query(
    "except_all_returned_parts",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n FROM (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
    GROUP BY 1
    """,
)
def except_all_returned_parts(spark, sf_dir):
    """EXCEPT ALL — MULTISET difference: per part, returned ('R')
    occurrences minus accepted ('A') occurrences, keeping surplus
    multiplicity (plain EXCEPT would collapse to existence). Spark
    plans exceptAll as a count-diff aggregate + generator replay:
    one shuffle on the value, no sort — the multiset semantics cost
    the same as a groupBy at any scale. Output is re-aggregated to
    (key, surplus) so the result is compact and hash-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.exceptAll(a).groupBy("l_partkey").agg(F.count("*").alias("n"))


@query(
    "intersect_all_returned_parts",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n FROM (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT ALL
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
    GROUP BY 1
    """,
)
def intersect_all_returned_parts(spark, sf_dir):
    """INTERSECT ALL — MULTISET intersection: per part,
    min(returned-count, accepted-count) occurrences survive. Same
    single-shuffle count-min aggregate shape as EXCEPT ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersectAll(a).groupBy("l_partkey").agg(F.count("*").alias("n"))
