"""Iterative linear-algebra driver: power iteration (repeated matvec).

The loop lives on the driver; each step is a broadcast matvec — the
canonical shape for PageRank-style algorithms on a COO matrix. A fixed
iteration count keeps it SQL-expressible (nested CTEs in the oracle);
values stay integer-exact so no normalization drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..matrix.fixtures import matrix_a, sql_matrix_a
from ..registry import query

_DOT = "CAST(SUM(CAST(m.v AS DECIMAL(18,4)) * CAST(x.v AS DECIMAL(18,4))) AS DOUBLE)"


@query(
    "power_iteration_2step",
    oracle=f"""
    WITH m AS ({sql_matrix_a(rows=50, cols=50)}),
    x0 AS (SELECT DISTINCT i AS j, 1.0 AS v FROM m),
    x1 AS (SELECT m.i AS j, {_DOT} AS v
           FROM m JOIN x0 x ON m.j = x.j GROUP BY m.i),
    x2 AS (SELECT m.i AS j, {_DOT} AS v
           FROM m JOIN x1 x ON m.j = x.j GROUP BY m.i)
    SELECT j AS i, v FROM x2
    """,
)
def power_iteration_2step(spark, sf_dir):
    """x2 = A(A x0) on the 50×50 derived matrix, x0 = all-ones over
    A's occupied row indices. Two driver-looped matvecs; each iteration
    broadcasts the current vector — the matrix never re-shuffles."""
    a = matrix_a(spark, sf_dir, rows=50, cols=50)
    x = a.df.select(F.col("i").alias("j")).distinct().withColumn(
        "v", F.lit(1.0)
    )
    for _ in range(2):
        x = a.matvec(x).select(F.col("i").alias("j"), "v")
    return x.select(F.col("j").alias("i"), "v")
