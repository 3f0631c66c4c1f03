"""Iterative linear-algebra driver: power iteration (repeated matvec).

The loop lives on the driver; each step is a broadcast matvec — the
canonical shape for PageRank-style algorithms on a COO matrix. A fixed
iteration count keeps it SQL-expressible (nested CTEs in the oracle);
values stay integer-exact so no normalization drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# floordiv: the exact integer floor-division idiom shared with the
# kmeans/PQ centroid updates (one definition, functions/exact.py).
from ..catalog import load_table
from ..functions.exact import floordiv as _floordiv
from ..functions.exact import sql_floordiv as _sql_floordiv
from ..matrix.fixtures import matrix_a, sql_matrix_a
from ..registry import query

_DOT = "CAST(CAST(SUM(CAST(m.v AS DECIMAL(18,4)) * CAST(x.v AS DECIMAL(18,4))) AS STRING) AS DOUBLE)"


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


# ---- Jacobi linear-system solver ----------------------------------------

JAC_N = 32  # system size (fold modulus)
JAC_CAP = 1000  # entry bound: counts mod JAC_CAP, so magnitudes are SF-free
JAC_Q = 1_000_000  # fixed-point grid: x carried as qx = floor(x * JAC_Q)

@query(
    "jacobi_solve_2iter",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey % {JAC_N} AS i, l_suppkey % {JAC_N} AS j
      FROM lineitem),
    m AS (SELECT i, j, COUNT(*) % {JAC_CAP} AS a FROM li GROUP BY 1, 2),
    off AS (SELECT * FROM m WHERE i != j),
    b AS (SELECT i, COUNT(*) % {JAC_CAP} AS b FROM li GROUP BY 1),
    dg AS (
      SELECT b.i, b.b, COALESCE(rs.rs, 0) * 2 + 1 AS d
      FROM b LEFT JOIN (SELECT i, SUM(a) AS rs FROM off GROUP BY 1) rs
        ON b.i = rs.i),
    x1 AS (
      SELECT i AS j, {_sql_floordiv(f'{JAC_Q} * b', 'd')} AS qx
      FROM dg),
    s2 AS (
      SELECT o.i, SUM(o.a * x.qx) AS s
      FROM off o JOIN x1 x ON o.j = x.j GROUP BY 1)
    SELECT dg.i AS i,
           {_sql_floordiv(f'{JAC_Q} * dg.b - COALESCE(s2.s, 0)', 'dg.d')} AS qx
    FROM dg LEFT JOIN s2 ON dg.i = s2.i
    """,
)
def jacobi_solve_2iter(spark, sf_dir):
    """Iterative linear-system solver: two Jacobi sweeps of A x = b,
    x_{{t+1}} = D⁻¹ (b − R x_t), on a strictly diagonally dominant
    system derived from lineitem (off-diagonal R from capped co-fold
    counts; D_i = 2·Σ_j R_ij + 1 guarantees dominance, hence
    convergence). Complements power_iteration_2step (eigenvector) with
    the SOLVE primitive behind ridge regression / label smoothing /
    PageRank-as-linear-system.

    Exactness: x rides a {JAC_Q} fixed-point grid as bigint qx and the
    update divides with the pmod floor-division idiom — every value is
    integer arithmetic, bit-identical across engines and iteration
    orderings (the oracle unrolls both sweeps as CTEs).

    Scale shape: R is the only data-sized relation and it never
    re-shuffles across sweeps; each sweep joins R to the BROADCAST
    n-row x, aggregates n partial sums (one shuffle of n rows), and
    updates x map-side — the textbook distributed Jacobi/Pregel round,
    O(nnz) per sweep."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % JAC_N).alias("i"),
        (F.col("l_suppkey") % JAC_N).alias("j"),
    )
    m = li.groupBy("i", "j").agg((F.count("*") % JAC_CAP).alias("a"))
    off = m.filter(F.col("i") != F.col("j"))
    b = li.groupBy("i").agg((F.count("*") % JAC_CAP).alias("b"))
    rs = off.groupBy("i").agg(F.sum("a").alias("rs"))
    dg = b.join(rs, "i", "left").select(
        "i", "b", (F.coalesce(F.col("rs"), F.lit(0)) * 2 + 1).alias("d")
    )
    x = dg.select(
        F.col("i").alias("j"),
        _floordiv(F.lit(JAC_Q) * F.col("b"), F.col("d")).alias("qx"),
    )
    for _ in range(1):  # sweep 2..ITER (sweep 1 is the closed form above)
        s = (
            off.join(F.broadcast(x), off.j == x.j)
            .groupBy(off.i.alias("i"))
            .agg(F.sum(F.col("a") * F.col("qx")).alias("s"))
        )
        x = dg.join(s, "i", "left").select(
            F.col("i").alias("j"),
            _floordiv(
                F.lit(JAC_Q) * F.col("b") - F.coalesce(F.col("s"), F.lit(0)),
                F.col("d"),
            ).alias("qx"),
        )
    return x.select(F.col("j").alias("i"), "qx")
