"""Incremental view maintenance: merge a delta batch into a
materialized aggregate without recomputing the base — the warehouse
pattern that keeps a 100 TB rollup fresh at delta cost instead of
full-scan cost. Decimal partials make the merge EXACTLY equal to the
full recompute (the oracle), which is the whole point: incremental and
batch answers must never drift.

Also: a Z-order (Morton) clustering key — interleaving the bits of two
dimension keys so range queries on EITHER dimension cluster well in
sorted-file layouts. Pure integer bit arithmetic, identical in both
engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dec
from ..registry import query


@query(
    "incremental_agg_maintenance",
    oracle="""
    SELECT o_orderstatus,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def incremental_agg_maintenance(spark, sf_dir):
    """Maintain revenue-per-status incrementally: aggregate the base
    partition (90% of orders) once, aggregate the delta batch (10%),
    and MERGE the partials — the oracle is the full recompute, and
    decimal partial aggregation guarantees merged == recomputed
    bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 10 != 0)
    delta = o.filter(F.col("o_orderkey") % 10 == 0)

    def partial(df):
        return df.groupBy("o_orderstatus").agg(
            F.sum(dec("o_totalprice")).alias("rev_dec"), F.count("*").alias("n")
        )

    merged = (
        partial(base)
        .unionByName(partial(delta))
        .groupBy("o_orderstatus")
        .agg(F.sum("rev_dec").alias("rev_dec"), F.sum("n").alias("n"))
    )
    return merged.select(
        "o_orderstatus", F.col("rev_dec").cast("double").alias("revenue"), "n"
    )


def _morton_terms(col_a: str, col_b: str, bits: int):
    """Interleave the low `bits` of a (even positions) and b (odd)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({col_a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({col_b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


# 21 bits per dimension (42-bit Morton) covers keys to ~2M — beyond
# sf1's l_orderkey range. 16 bits silently ALIASED keys >65535 at
# sf0.1, interleaving unrelated rows and defeating the clustering.
MORTON_BITS = 21


@query(
    "zorder_morton_keys",
    oracle=f"""
    SELECT l_orderkey, l_partkey,
           CAST({_morton_terms('l_orderkey', 'l_partkey', MORTON_BITS)} AS BIGINT) AS morton
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def zorder_morton_keys(spark, sf_dir):
    """Morton (Z-order) key over (orderkey, partkey): sorting the table
    by this key clusters BOTH dimensions, so min/max file stats prune
    range predicates on either column — the poor-man's Z-ordering any
    parquet layout can use."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_partkey",
        F.expr(_morton_terms("l_orderkey", "l_partkey", MORTON_BITS))
        .cast("bigint")
        .alias("morton"),
    )


IVM_CUTOFF = "1999-01-01"


@query(
    "join_view_ivm",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
             AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def join_view_ivm(spark, sf_dir):
    """Incremental maintenance of a JOIN view under inserts to BOTH
    sides — the delta-join identity
        (O ∪ ΔO) ⋈ (L ∪ ΔL) = O⋈L ∪ ΔO⋈L ∪ O⋈ΔL ∪ ΔO⋈ΔL
    with orders/lineitem split into base (< 1999) and delta (≥ 1999)
    batches. The maintained view is the union of the base join (the
    already-materialized 100 TB asset) and the three delta joins,
    each sized by the DELTA — the reason a daily refresh costs
    |Δ|·(join fan-out) instead of a full recompute. The oracle IS the
    full recompute, so the gate checks the identity itself: decimal
    revenue partials make union-then-aggregate bit-equal to
    recompute-then-aggregate under any partitioning.

    At scale the three delta joins broadcast Δ when small and the
    base join is never re-run — here all four run so the fixture
    proves the algebra, aggregated to a per-flag digest."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag", "l_extendedprice"
    )
    cut = F.lit(IVM_CUTOFF).cast("timestamp")
    o_base, o_delta = o.filter(F.col("o_orderdate") < cut), o.filter(
        F.col("o_orderdate") >= cut
    )
    l_base, l_delta = li.filter(F.col("l_shipdate") < cut), li.filter(
        F.col("l_shipdate") >= cut
    )

    def j(os, ls):
        return os.join(ls, os.o_orderkey == ls.l_orderkey).select(
            "l_returnflag", "l_extendedprice"
        )

    view = (
        j(o_base, l_base)
        .unionByName(j(o_delta, l_base))
        .unionByName(j(o_base, l_delta))
        .unionByName(j(o_delta, l_delta))
    )
    return view.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
    )
