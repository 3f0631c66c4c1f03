"""Block (SUMMA-style) distributed matmul with NumPy kernels.

The plain join+agg matmul (coo.py) shuffles one row per (i, j, k)
triple at the aggregation input — fine for sparse, quadratic-ish for
dense. The block algorithm replicates at BLOCK granularity instead:

  1. tag each A entry with its (row-block, shared-block), each B entry
     with (shared-block, col-block);
  2. replicate A blocks across B's column-blocks and B blocks across
     A's row-blocks (the classic one-pass block replication — same
     idea as the reference's element-wise replication mapper,
     mapper/main.py:24-41, but n/bs times cheaper);
  3. one shuffle groups each (rowblock, sharedblock, colblock) cell
     pair; a NumPy GEMM inside applyInPandas multiplies the two dense
     blocks (the reference's own future-work idea, README.md:57);
  4. a final groupBy(i, k) sums the partial products.

Shuffle volume: O(nnz · n/bs) instead of the entry-level join's
O(flops) agg input — with bs=1024 on a cluster that is a 1000×
reduction; locally we use small blocks to exercise multi-block paths.

Exactness note: the GEMM accumulates in float64, so results are
bit-exact (and DuckDB-oracle-checkable) for integer-valued matrices;
for arbitrary reals use the join+agg path with exact=True.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .coo import CooMatrix, validate_matmul_dims

PARTIAL_SCHEMA = "i long, k long, pv double"


def block_multiply(a: CooMatrix, b: CooMatrix, block_size: int = 16) -> CooMatrix:
    validate_matmul_dims(a.n_rows, a.n_cols, b.n_rows, b.n_cols)
    bs = block_size
    n_bi = (a.n_rows + bs - 1) // bs
    n_bk = (b.n_cols + bs - 1) // bs

    adf = a.with_names("i", "j").df
    bdf = b.with_names("j", "k").df

    # Replicate A entries across B's column blocks, B entries across
    # A's row blocks; tag rows so the kernel can split them.
    a_rep = adf.select(
        (F.col("i") / bs).cast("long").alias("bi"),
        (F.col("j") / bs).cast("long").alias("bj"),
        F.explode(F.sequence(F.lit(0), F.lit(n_bk - 1))).alias("bk"),
        F.lit("A").alias("tag"),
        F.col("i").alias("r"),
        F.col("j").alias("c"),
        F.col("v"),
    )
    b_rep = bdf.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bi - 1))).alias("bi"),
        (F.col("j") / bs).cast("long").alias("bj"),
        (F.col("k") / bs).cast("long").alias("bk"),
        F.lit("B").alias("tag"),
        F.col("j").alias("r"),
        F.col("k").alias("c"),
        F.col("v"),
    )
    tagged = a_rep.unionByName(b_rep)

    # Self-contained kernel (no package globals — cloudpickle ships it
    # by value; workers need nothing on sys.path).
    def gemm(pdf):
        import numpy as np
        import pandas as pd

        a_rows = pdf[pdf["tag"] == "A"]
        b_rows = pdf[pdf["tag"] == "B"]
        if a_rows.empty or b_rows.empty:
            return pd.DataFrame(columns=["i", "k", "pv"]).astype(
                {"i": "int64", "k": "int64", "pv": "float64"}
            )
        ai = a_rows["r"].to_numpy()
        aj = a_rows["c"].to_numpy()
        bj = b_rows["r"].to_numpy()
        bk = b_rows["c"].to_numpy()
        i0, j0, k0 = ai.min(), bj.min(), bk.min()
        A = np.zeros((ai.max() - i0 + 1, max(aj.max(), bj.max()) - j0 + 1))
        B = np.zeros((A.shape[1], bk.max() - k0 + 1))
        A[ai - i0, aj - j0] = a_rows["v"].to_numpy()
        B[bj - j0, bk - k0] = b_rows["v"].to_numpy()
        C = A @ B
        nz_i, nz_k = np.nonzero(C)
        return pd.DataFrame(
            {"i": nz_i + i0, "k": nz_k + k0, "pv": C[nz_i, nz_k]}
        )

    partials = tagged.groupBy("bi", "bj", "bk").applyInPandas(gemm, PARTIAL_SCHEMA)
    out = (
        partials.groupBy("i", "k")
        .agg(F.sum("pv").alias("v"))
        .select("i", F.col("k").alias("j"), "v")
    )
    return CooMatrix(out, a.n_rows, b.n_cols)


def mllib_block_multiply(a: CooMatrix, b: CooMatrix, block_size: int = 16) -> DataFrame:
    """Alternate path: Spark MLlib's BlockMatrix.multiply (distributed
    Breeze GEMM) — COO DataFrame → CoordinateMatrix → BlockMatrix →
    multiply → back to a COO DataFrame (i, j, v)."""
    from pyspark.mllib.linalg.distributed import CoordinateMatrix, MatrixEntry

    validate_matmul_dims(a.n_rows, a.n_cols, b.n_rows, b.n_cols)
    spark = a.df.sparkSession

    def to_cm(m: CooMatrix) -> CoordinateMatrix:
        entries = m.with_names("i", "j").df.rdd.map(
            lambda r: MatrixEntry(r["i"], r["j"], r["v"])
        )
        return CoordinateMatrix(entries, m.n_rows, m.n_cols)

    product = (
        to_cm(a)
        .toBlockMatrix(block_size, block_size)
        .multiply(to_cm(b).toBlockMatrix(block_size, block_size))
        .toCoordinateMatrix()
    )
    rows = product.entries.map(lambda e: (e.i, e.j, float(e.value)))
    out = spark.createDataFrame(rows, "i long, j long, v double")
    return out.filter(F.col("v") != 0.0)
