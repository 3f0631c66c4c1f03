"""K-means (Lloyd) clustering over embeddings in EXACT integer
arithmetic — the training loop behind IVF cell assignment
(similarity/ivf.py uses fixed seed centroids; this is how they would
actually be trained).

Why integers: a float k-means can never be hash-checked cross-engine —
centroid means are order-dependent double sums. Here every component is
quantized to a 1e-6 grid up front (``qx = FLOOR(x * 1e6)``, one exact
IEEE multiply + floor, identical in Spark and DuckDB), distances are
bigint sums of squares, and centroid updates are exact floor
divisions. Every iteration is therefore bit-reproducible under any
partitioning/shuffle schedule, in both engines.

Shapes (and why this survives 100 TB):
- quantized dims: map-only posexplode, never shuffled;
- assignment: broadcast join against the K*64-row centroid table,
  then a groupBy (vec_id, k) whose partial agg collapses map-side
  (all 64*K rows of one vector sit in one input partition);
- update: groupBy (k, dim) — 512 groups, partial-aggregated;
- the driver loop moves only the tiny centroid table per round —
  the corpus is scanned once per iteration and never re-shuffled.

Reference parity: the reference repo has no clustering; this extends
the SURVEY §2 similarity-search category (IVF training) the same way
its MapReduce pipeline extends matmul.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

N_DIMS = 64
K = 8  # clusters; initial centroids = vectors 0..K-1
Q = 1_000_000  # quantization grid (1e-6 component resolution)
ITERATIONS = 2


def quantized_dims(e: DataFrame) -> DataFrame:
    """(vec_id, dim, qx) — embedding components on the integer grid."""
    x = F.posexplode(F.col("embedding").cast("array<double>")).alias(
        "dim", "x"
    )
    return e.select("vec_id", x).select(
        "vec_id", "dim", F.floor(F.col("x") * Q).cast("bigint").alias("qx")
    )


def assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, k, dist) — nearest centroid by exact squared L2
    distance, ties broken on the lower cluster id."""
    d = (
        q.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "k")
        .agg(
            F.sum(
                (F.col("qx") - F.col("c")) * (F.col("qx") - F.col("c"))
            ).alias("dist")
        )
    )
    w = W.partitionBy("vec_id").orderBy("dist", "k")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def update(q: DataFrame, a: DataFrame) -> DataFrame:
    """(k, dim, c) — new centroids: exact floor(mean) per dimension.
    ``(s - pmod(s, n)) / n`` is an exact integer floor division in
    both engines (the subtraction makes the numerator divisible, so
    the double division is exact)."""
    s = F.sum("qx")
    n = F.count("*")
    return (
        q.join(a.select("vec_id", "k"), "vec_id")
        .groupBy("k", "dim")
        .agg(((s - F.pmod(s, n)) / n).cast("bigint").alias("c"))
    )


def lloyd(e: DataFrame, iterations: int = ITERATIONS):
    """Run ``iterations`` Lloyd rounds; returns (assignments,
    centroids) DataFrames after the final round."""
    q = quantized_dims(e)
    cents = (
        q.filter(F.col("vec_id") < K)
        .select(F.col("vec_id").alias("k"), "dim", F.col("qx").alias("c"))
    )
    a = None
    for _ in range(iterations):
        a = assign(q, cents)
        cents = update(q, a)
    return a, cents


# ---- DuckDB SQL mirror ----------------------------------------------------

def sql_lloyd_ctes(iterations: int = ITERATIONS) -> str:
    """CTE chain q, c0, d1, a1, c1, d2, a2, c2, ... mirroring
    :func:`lloyd` exactly."""
    parts = [
        f"""q AS (
      SELECT vec_id, r.i AS dim,
             CAST(FLOOR(CAST(embedding[r.i + 1] AS DOUBLE) * {Q}) AS BIGINT)
               AS qx
      FROM embeddings, UNNEST(range(0, {N_DIMS})) AS r(i)),
    c0 AS (SELECT vec_id AS k, dim, qx AS c FROM q WHERE vec_id < {K})""",
    ]
    for it in range(1, iterations + 1):
        prev = f"c{it - 1}"
        parts.append(
            f"""d{it} AS (
      SELECT q.vec_id, c.k,
             CAST(SUM((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS dist
      FROM q JOIN {prev} c ON q.dim = c.dim
      GROUP BY 1, 2),
    a{it} AS (
      SELECT vec_id, k, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dist, k) AS rn
        FROM d{it}) WHERE rn = 1),
    c{it} AS (
      SELECT a.k, q.dim,
             CAST((SUM(q.qx) - ((SUM(q.qx) % COUNT(*)) + COUNT(*)) % COUNT(*))
                  / COUNT(*) AS BIGINT) AS c
      FROM q JOIN a{it} a ON q.vec_id = a.vec_id
      GROUP BY 1, 2)"""
        )
    return ",\n    ".join(parts)
