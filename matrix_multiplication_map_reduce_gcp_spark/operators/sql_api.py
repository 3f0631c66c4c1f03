"""Queries expressed through the SQL API (spark.sql over registered
views) — same Catalyst plans as the DataFrame API, exercised explicitly
so the SQL surface is covered end-to-end: CTEs, window SQL, UNPIVOT via
stack(), struct/map expressions, and a multi-stage training-data
pipeline in one statement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table, register_views
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
    SELECT n_name, CAST(CAST(rev_dec AS STRING) AS DOUBLE) AS revenue,
           CAST(CAST(rev_dec AS STRING) AS DOUBLE) / CAST(CAST(SUM(rev_dec) OVER () AS STRING) AS DOUBLE) AS share,
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
    o = load_table(spark, sf_dir, "orders").filter(
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


# One SQL text per subquery form, executed verbatim by both engines —
# the subquery surface (EXISTS / scalar / IN / NOT IN / LATERAL) is
# where engines disagree most, so running identical text is the
# strongest parity check.

_EXISTS_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
"""


@query("correlated_exists_orders", oracle=_EXISTS_SQL)
def correlated_exists_orders(spark, sf_dir):
    """Correlated EXISTS — decorrelated by both planners into a left
    semi join on o_custkey with the price predicate pushed below it
    (verified via explain: no per-row subquery execution)."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_SCALAR_SUB_SQL = """
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE CAST(p_retailprice AS DECIMAL(12,2)) * (SELECT COUNT(*) FROM part)
          > (SELECT SUM(CAST(p_retailprice AS DECIMAL(12,2))) FROM part)
"""


@query("scalar_subquery_above_avg", oracle=_SCALAR_SUB_SQL)
def scalar_subquery_above_avg(spark, sf_dir):
    """Uncorrelated scalar subqueries: parts priced above the corpus
    mean. The mean compare is cross-multiplied into exact DECIMAL
    arithmetic (price·N > Σprice) — a double AVG would be
    order-dependent across engines. Scalar subqueries execute once and
    broadcast as literals into the scan filter."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SUB_SQL)


_NOT_IN_SQL = """
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
       WHERE o_custkey NOT IN
         (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END
          FROM customer)) AS n_not_in_with_nulls,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
       WHERE NOT EXISTS
         (SELECT 1 FROM customer c
          WHERE c.c_custkey = o.o_custkey AND c.c_acctbal >= 0))
        AS n_not_exists_equivalent
"""


@query("not_in_null_semantics", oracle=_NOT_IN_SQL)
def not_in_null_semantics(spark, sf_dir):
    """The NOT IN null footgun, pinned: a NULL in the subquery list
    makes `x NOT IN (...)` UNKNOWN for every row (tri-valued logic), so
    the first count is 0 — while the NOT EXISTS spelling of the same
    business question counts normally. Both engines must agree on both
    counts; a pipeline migrating filters between the two forms relies
    on exactly this semantics."""
    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_SQL)


_LATERAL_SQL = """
    SELECT n.n_name, s.s_name, s.s_acctbal
    FROM nation n, LATERAL (
      SELECT s_name, s_acctbal
      FROM supplier
      WHERE s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_suppkey
      LIMIT 2) s
"""


@query("lateral_top2_suppliers", oracle=_LATERAL_SQL)
def lateral_top2_suppliers(spark, sf_dir):
    """LATERAL correlated subquery with per-group ORDER BY + LIMIT —
    the top-k-per-key shape written as SQL the way a user would; both
    planners rewrite it to a ranked window/join, not a per-row loop.
    Deterministic tiebreak on s_suppkey."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_IN_SUB_SQL = """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY o_orderstatus
"""


@query("in_subquery_filter", oracle=_IN_SUB_SQL)
def in_subquery_filter(spark, sf_dir):
    """Uncorrelated IN subquery — planned as a semi join (broadcast
    when the inner side is small), never a materialized value list."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SUB_SQL)


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
           CAST(CAST(SUM(n_tokens) AS STRING) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM deduped WHERE rn = 1
    GROUP BY lang
    """,
)
def training_data_pipeline(spark, sf_dir):
    """The end-to-end LLM data-pipeline shape in one plan: per-doc
    stats → quality filter → exact dedup (keep first per hash) → corpus
    accounting per language. Single pass + one window + one agg; no
    operator materializes intermediates."""
    d = load_table(spark, sf_dir, "documents")
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


@query(
    "sql_recursive_referral_depth",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey = 0
      UNION ALL
      SELECT c.c_custkey, p.depth + 1
      FROM customer c JOIN chain p ON c.c_custkey // 10 = p.c_custkey
      WHERE c.c_custkey != 0)
    SELECT depth, COUNT(*) AS n_customers,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM chain GROUP BY depth
    """,
)
def sql_recursive_referral_depth(spark, sf_dir):
    """Spark 4 RECURSIVE CTE (SPARK-24497): transitive closure over a
    derived referral tree (parent = custkey DIV 10, rooted at 0) —
    per-depth membership counts.

    The recursion is a Catalyst-iterated union: each step joins the
    previous frontier against the table, so work per round is
    O(frontier), and rounds equal the tree DEPTH (log_10 of the key
    space here) — the same frontier-expansion cost model as the
    pointer-jumping connected components, now expressible directly in
    SQL. DuckDB runs the identical recursion (// is its integer
    division) as the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey = 0
          UNION ALL
          SELECT c.c_custkey, p.depth + 1
          FROM customer c JOIN chain p ON c.c_custkey DIV 10 = p.c_custkey
          WHERE c.c_custkey != 0)
        SELECT depth, COUNT(*) AS n_customers,
               MIN(c_custkey) AS min_key,
               MAX(c_custkey) AS max_key
        FROM chain GROUP BY depth
        """
    )


@query(
    "sql_pipe_syntax_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax_revenue(spark, sf_dir):
    """Spark 4 SQL pipe syntax (SPARK-49555): the linear FROM |> WHERE
    |> AGGREGATE form of a filtered revenue rollup, with the filter
    threshold bound as a NAMED PARAMETER (spark.sql args= — no string
    interpolation, no injection surface). Identical Catalyst plan to
    the classic form the oracle uses; decimal aggregation keeps the
    double cast order-independent."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity >= :minqty
        |> AGGREGATE COUNT(*) AS n,
                     CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        """,
        args={"minqty": 25},
    )


@query(
    "sql_scalar_udf_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE)
             AS disc_revenue,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_scalar_udf_revenue(spark, sf_dir):
    """Spark 4 SQL-defined scalar UDF (SPARK-46246, CREATE FUNCTION
    ... RETURN expr): the discount formula lives as a reusable,
    catalog-registered SQL function instead of a copy-pasted
    expression — and because it is pure SQL, Catalyst INLINES it into
    the plan (no Python, no serialization boundary, full codegen), so
    it scales exactly like the hand-inlined expression the oracle
    uses. The body keeps the repo's decimal discipline: exact decimal
    math inside, one double cast after the SUM."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(25,4)
        RETURN CAST(p AS DECIMAL(12,2)) * (1 - CAST(d AS DECIMAL(12,2)))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(CAST(SUM(disc_price(l_extendedprice, l_discount)) AS STRING) AS DOUBLE)
                 AS disc_revenue,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
        """
    )
