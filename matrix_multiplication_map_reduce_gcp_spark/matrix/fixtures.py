"""Deterministic matrix derivations from the fixture tables.

The driver's DuckDB oracle can only see the ten registered parquet
views, so matrix queries derive their COO operands *from lineitem*
with modular index folding + COUNT/SUM values. Both engines derive the
identical matrix, making matmul a fully oracle-checkable query.

Values are integer-valued (counts / integral quantity sums) so every
product & sum is exact in double — no cross-engine ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .coo import CooMatrix


def matrix_a(spark: SparkSession, sf_dir: str, rows: int = 40, cols: int = 60) -> CooMatrix:
    """A[i,j] = #lineitems with l_orderkey≡i (mod rows), l_partkey≡j (mod cols)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    df = (
        li.groupBy(
            (F.col("l_orderkey") % rows).alias("i"), (F.col("l_partkey") % cols).alias("j")
        )
        .agg(F.count("*").cast("double").alias("v"))
    )
    return CooMatrix(df, rows, cols)


def matrix_b(spark: SparkSession, sf_dir: str, rows: int = 60, cols: int = 30) -> CooMatrix:
    """B[j,k] = Σ l_quantity over lineitems with l_partkey≡j, l_suppkey≡k."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    df = (
        li.groupBy(
            (F.col("l_partkey") % rows).alias("j"), (F.col("l_suppkey") % cols).alias("k")
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(22,2)")).cast("double").alias("v"))
        .select(F.col("j").alias("i"), F.col("k").alias("j"), "v")
    )
    return CooMatrix(df, rows, cols)


def matrix_sparse(spark: SparkSession, sf_dir: str, rows: int = 200, cols: int = 300) -> CooMatrix:
    """~Sparse operand: only high-quantity lineitems contribute, folded
    over a larger index space so most cells are empty (implicit zeros)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    df = (
        li.filter(F.col("l_quantity") > 45)
        .groupBy(
            (F.col("l_orderkey") % rows).alias("i"), (F.col("l_partkey") % cols).alias("j")
        )
        .agg(F.count("*").cast("double").alias("v"))
    )
    return CooMatrix(df, rows, cols)


def matrix_fold(
    spark: SparkSession,
    sf_dir: str,
    row_key: str,
    col_key: str,
    rows: int,
    cols: int,
    cap: int,
) -> CooMatrix:
    """M[i,j] = COUNT(*) mod ``cap``, folded on (row_key % rows,
    col_key % cols). The ``cap`` bounds every entry below ``cap`` so
    chained products (matmul pipelines) stay exactly representable at
    ANY scale factor — counts grow with SF, ``count % cap`` doesn't."""
    li = load_table(spark, sf_dir, "lineitem").select(row_key, col_key)
    df = li.groupBy(
        (F.col(row_key) % rows).alias("i"), (F.col(col_key) % cols).alias("j")
    ).agg((F.count("*") % cap).cast("double").alias("v"))
    return CooMatrix(df, rows, cols)


# ---- SQL mirrors (DuckDB oracle CTEs) -----------------------------------

SQL_MATRIX_A = """
SELECT l_orderkey % {rows} AS i, l_partkey % {cols} AS j,
       CAST(COUNT(*) AS DOUBLE) AS v
FROM lineitem GROUP BY 1, 2
"""

SQL_MATRIX_B = """
SELECT l_partkey % {rows} AS i, l_suppkey % {cols} AS j,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(22,2))) AS STRING) AS DOUBLE) AS v
FROM lineitem GROUP BY 1, 2
"""

SQL_MATRIX_SPARSE = """
SELECT l_orderkey % {rows} AS i, l_partkey % {cols} AS j,
       CAST(COUNT(*) AS DOUBLE) AS v
FROM lineitem WHERE l_quantity > 45 GROUP BY 1, 2
"""


def sql_matrix_a(rows: int = 40, cols: int = 60) -> str:
    return SQL_MATRIX_A.format(rows=rows, cols=cols)


def sql_matrix_b(rows: int = 60, cols: int = 30) -> str:
    return SQL_MATRIX_B.format(rows=rows, cols=cols)


def sql_matrix_sparse(rows: int = 200, cols: int = 300) -> str:
    return SQL_MATRIX_SPARSE.format(rows=rows, cols=cols)


def sql_matrix_fold(row_key: str, col_key: str, rows: int, cols: int, cap: int) -> str:
    """DuckDB mirror of :func:`matrix_fold`."""
    return (
        f"SELECT {row_key} % {rows} AS i, {col_key} % {cols} AS j, "
        f"CAST(COUNT(*) % {cap} AS DOUBLE) AS v "
        f"FROM lineitem GROUP BY 1, 2"
    )
