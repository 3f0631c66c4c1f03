"""Scalar-function surface: string / date / math / conditional / JSON /
array expressions — SURVEY.md §2.3 "Scalar functions" (the reference
only had string key format/parse + `*`/`+`, mapper/main.py:28,
reducer/main.py:18,32).

Everything here is a built-in `pyspark.sql.functions` call — JVM-side
inside whole-stage codegen, no Python in the hot path. Oracles restrict
to expressions whose semantics are bit-identical in DuckDB (no libm
transcendentals; integer/decimal arithmetic; IEEE sqrt).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CONCAT(c_name, ':', c_mktsegment) AS name_seg,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           TRIM(CONCAT(' ', c_name, ' ')) AS name_trimmed,
           CASE WHEN c_name LIKE '%001%' THEN 1 ELSE 0 END AS has_001
    FROM customer
    """,
)
def string_functions(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trimmed"),
        F.when(F.col("c_name").like("%001%"), 1).otherwise(0).alias("has_001"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           EXTRACT(DAY FROM o_orderdate) AS dom,
           EXTRACT(QUARTER FROM o_orderdate) AS qtr,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(o_orderdate AS DATE) AS order_day
    FROM orders
    """,
)
def date_functions(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.col("o_orderdate").cast("date").alias("order_day"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 50000.0) AS abs_diff,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_ceil_k,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_floor_k,
           ROUND(l_extendedprice / 7.0, 2) AS price_seventh,
           SQRT(l_quantity) AS qty_sqrt,
           l_orderkey % 97 AS key_mod,
           CAST(l_quantity AS BIGINT) // 10 AS qty_decile
    FROM lineitem
    """,
)
def math_functions(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_diff"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_ceil_k"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_floor_k"),
        F.round(F.col("l_extendedprice") / 7.0, 2).alias("price_seventh"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        (F.col("l_quantity").cast("bigint") / F.lit(10)).cast("bigint").alias("qty_decile"),
    )


@query(
    "json_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extraction(spark, sf_dir):
    """JSON path extraction over events.props (stringly-typed payloads
    are a first-class pattern at 100 TB — extraction stays JVM-side)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "conditional_null_handling",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS bal_is_null,
           GREATEST(c_acctbal, 0.0) AS bal_floor,
           LEAST(c_acctbal, 1000.0) AS bal_cap
    FROM customer
    """,
)
def conditional_null_handling(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias("bal_is_null"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor"),
        F.least("c_acctbal", F.lit(1000.0)).alias("bal_cap"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           CASE WHEN list_contains(string_split(text, ' '), 'spark') THEN 1 ELSE 0 END AS has_spark,
           list_sort(string_split(text, ' '))[1] AS first_token_sorted
    FROM documents
    """,
)
def array_functions(spark, sf_dir):
    """Array expressions over tokenized text (split/size/distinct/
    contains/sort) — all JVM built-ins."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.element_at(F.sort_array(toks), 1).alias("first_token_sorted"),
    )


@query(
    "regexp_functions",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           CASE WHEN regexp_matches(c_name, '0{2,}') THEN 1 ELSE 0 END AS has_00
    FROM customer
    """,
)
def regexp_functions(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.when(F.col("c_name").rlike("0{2,}"), 1).otherwise(0).alias("has_00"),
    )


@query(
    "variant_shredding_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT) AS n_missing_hits,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_even
    FROM events
    GROUP BY event_type
    """,
)
def variant_shredding_stats(spark, sf_dir):
    """Spark 4 VariantType path: props parses ONCE into the binary
    variant encoding (parse_json), then typed extraction via
    variant_get — unlike get_json_object, the JSON text is not
    re-parsed per extraction, which is the difference between O(paths)
    and O(1) parse work per row on wide payloads at 100 TB.
    try_variant_get on an absent path yields NULL (counted: always 0
    hits) instead of failing — the schema-drift-tolerant accessor."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "string")
    return e.select(
        "event_type", k.alias("k"), missing.alias("missing")
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.count("missing").alias("n_missing_hits"),
        F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_even"),
    )


@query(
    "try_arithmetic_semantics",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_custkey % 3 = 0) AS BIGINT)
             AS n_div_by_zero,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice / NULLIF(o_custkey % 3, 0), 6)
                         AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS sum_safe_ratio,
           CAST(COUNT(o_totalprice / NULLIF(o_custkey % 3, 0)) AS BIGINT)
             AS n_ratio_rows
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def try_arithmetic_semantics(spark, sf_dir):
    """ANSI-mode error semantics (Spark 4 runs ANSI by default, where
    x/0 THROWS): try_divide yields NULL-on-error instead — the form a
    pipeline uses when bad denominators are data, not bugs. The oracle
    expresses the identical semantics portably as x / NULLIF(d, 0)
    (DuckDB has no try_ family). Each per-row double ratio is rounded
    and summed in DECIMAL so the aggregate stays order-independent;
    NULL rows fall out of both the SUM and the COUNT identically in
    the two engines — pinning that the null-propagation contracts
    agree, not just the happy path."""
    o = load_table(spark, sf_dir, "orders")
    denom = F.col("o_custkey") % 3
    ratio = F.try_divide(F.col("o_totalprice"), denom)
    safe = F.round(ratio, 6).cast("decimal(18,6)")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(denom == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_div_by_zero"),
        F.sum(safe).cast("double").alias("sum_safe_ratio"),
        F.count(ratio).alias("n_ratio_rows"),
    )
