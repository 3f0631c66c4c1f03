"""Queries expressed through the SQL API (spark.sql over registered
views) — same Catalyst plans as the DataFrame API, exercised explicitly
so the SQL surface is covered end-to-end: CTEs, window SQL, UNPIVOT via
stack(), struct/map expressions, and a multi-stage training-data
pipeline in one statement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import register_views
from ..registry import query


# One SQL text, executed verbatim by BOTH engines. The window total
# stays DECIMAL (exact) until the final division — a windowed SUM over
# doubles would be order-dependent and hash-mismatch at larger SFs.
_SHARE_SQL = """
    WITH nation_rev AS (
      SELECT n.n_name AS n_name,
             SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS rev_dec
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
           CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS share,
           RANK() OVER (ORDER BY rev_dec DESC, n_name) AS rnk
    FROM nation_rev
"""


@query("sql_cte_window_share", oracle=_SHARE_SQL)
def sql_cte_window_share(spark, sf_dir):
    """CTE + windowed share-of-total, written in SQL (identical text
    runs on Spark and DuckDB)."""
    register_views(spark, sf_dir)
    return spark.sql(_SHARE_SQL)


@query(
    "sql_unpivot_balances",
    oracle="""
    WITH per_nation AS (
      SELECT n_nationkey,
             CAST(COALESCE((SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer c
                            WHERE c.c_nationkey = n.n_nationkey), 0) AS DOUBLE) AS customer_bal,
             CAST(COALESCE((SELECT SUM(CAST(s_acctbal AS DECIMAL(12,2))) FROM supplier s
                            WHERE s.s_nationkey = n.n_nationkey), 0) AS DOUBLE) AS supplier_bal
      FROM nation n)
    SELECT n_nationkey, 'customer' AS side, customer_bal AS bal FROM per_nation
    UNION ALL
    SELECT n_nationkey, 'supplier' AS side, supplier_bal AS bal FROM per_nation
    """,
)
def sql_unpivot_balances(spark, sf_dir):
    """UNPIVOT (wide→long) via stack() — the melt shape; correlated
    scalar subqueries build the wide input."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH per_nation AS (
          SELECT n_nationkey,
                 CAST(COALESCE((SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer c
                                WHERE c.c_nationkey = n.n_nationkey), 0) AS DOUBLE) AS customer_bal,
                 CAST(COALESCE((SELECT SUM(CAST(s_acctbal AS DECIMAL(12,2))) FROM supplier s
                                WHERE s.s_nationkey = n.n_nationkey), 0) AS DOUBLE) AS supplier_bal
          FROM nation n)
        SELECT n_nationkey, side, bal
        FROM per_nation
        LATERAL VIEW stack(2, 'customer', customer_bal, 'supplier', supplier_bal) AS side, bal
        """
    )


@query(
    "struct_map_functions",
    oracle="""
    SELECT o_orderkey,
           ({'status': o_orderstatus, 'priority': o_orderpriority}).status AS s_field,
           ({'status': o_orderstatus, 'priority': o_orderpriority}).priority AS p_field,
           map_extract(MAP {'total': o_totalprice}, 'total')[1] AS m_total,
           CAST(o_totalprice AS VARCHAR) || '|' || o_orderstatus AS packed
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def struct_map_functions(spark, sf_dir):
    """Struct + map construction and field/key access. Nested values
    are projected back to scalars before the gate (engines canonicalize
    raw struct cells differently), so the nested ops are exercised while
    the compared output stays scalar."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % 100 == 0
    )
    props = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    m = F.create_map(F.lit("total"), F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        props.getField("status").alias("s_field"),
        props.getField("priority").alias("p_field"),
        F.element_at(m, "total").alias("m_total"),
        F.concat_ws("|", F.col("o_totalprice").cast("string"), "o_orderstatus").alias(
            "packed"
        ),
    )


@query(
    "training_data_pipeline",
    oracle="""
    WITH stats AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             md5(text) AS text_hash
      FROM documents),
    quality AS (
      SELECT *, CAST(n_distinct AS DOUBLE) / n_tokens AS diversity
      FROM stats
      WHERE n_tokens >= 20 AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.1),
    deduped AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
      FROM quality)
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM deduped WHERE rn = 1
    GROUP BY lang
    """,
)
def training_data_pipeline(spark, sf_dir):
    """The end-to-end LLM data-pipeline shape in one plan: per-doc
    stats → quality filter → exact dedup (keep first per hash) → corpus
    accounting per language. Single pass + one window + one agg; no
    operator materializes intermediates."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split("text", " ")
    stats = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.md5("text").alias("text_hash"),
    )
    quality = stats.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("n_distinct").cast("double") / F.col("n_tokens") >= 0.1)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("text_hash").orderBy("doc_id")
    deduped = quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
    )
