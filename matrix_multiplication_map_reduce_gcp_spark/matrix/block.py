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
     pair; a NumPy GEMM inside mapInArrow multiplies the two dense
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
    """SUMMA over PACKED blocks: entries are densified into one array
    row per block map-side (collect_list — partial-aggregatable), so
    every shuffle moves block rows, never entry rows:

      stage 1: A-blocks ⋈ B-blocks on the shared block index
               (|blocks_A| + |blocks_B| rows shuffled);
      stage 2: per joined pair, one NumPy GEMM (mapInArrow);
      stage 3: partial product blocks re-grouped by output block
               (bi, bk) and array-summed — (n/bs)³ block rows;
      stage 4: final explode back to COO is map-side only.

    For dense 1000×1000 @ bs=250 that is 32 + 64 + 64 block rows
    through the shuffles instead of ~8M entry rows — the difference
    between Arrow-serializing the matrix 4× and once."""
    validate_matmul_dims(a.n_rows, a.n_cols, b.n_rows, b.n_cols)
    bs = block_size
    # The Arrow kernel emits each block as one list<double> row whose
    # ListArray offsets are int32: past bs=46340 a SINGLE block row
    # overflows them, and the failure would surface as an opaque
    # pyarrow offset error deep in the gemm stage (r5 ADVICE). Fail at
    # planning time instead; matrices larger than that want more
    # blocks, not bigger ones (per-block GEMM is already ~100 GFLOP).
    if bs * bs >= 1 << 31:
        raise ValueError(
            f"block_size={bs} overflows int32 Arrow ListArray offsets "
            f"(block_size**2 must stay < 2**31; use more, smaller blocks)"
        )

    def pack(df, row, col, bs):
        """(block_r, block_c, positions[], values[]) per block. The two
        arrays are projected from ONE sorted struct array so they stay
        aligned; the Python kernel scatters them with numpy fancy
        indexing (C speed). This is the JVM collect_list(struct) +
        sort_array form: collect_list is partial-aggregatable, so entry
        rows are packed into per-block partials MAP-SIDE and every
        Exchange moves block rows, never entry rows — the 100 TB
        contract pinned by test_summa_block_plan_shuffles_block_rows_
        only. (An r12 applyInArrow densify traded that for lower GC and
        lost ~3× wall on the 4000² bench at both core counts — reverted
        r13; see OPTIMIZATION_r13.md.) NB: densifying JVM-side via a
        map + element_at lookup is a trap — Catalyst maps are
        scan-on-access, making that O(bs^4) per block."""
        pos = (F.col(row) % bs).cast("int") * bs + (F.col(col) % bs).cast("int")
        grouped = df.groupBy(
            (F.col(row) / bs).cast("long").alias("br"),
            (F.col(col) / bs).cast("long").alias("bc"),
        ).agg(
            F.sort_array(
                F.collect_list(F.struct(pos.alias("p"), F.col("v")))
            ).alias("cells")
        )
        return grouped.select(
            "br", "bc", F.col("cells.p").alias("ps"), F.col("cells.v").alias("vs")
        )

    a_blocks = pack(a.with_names("i", "j").df, "i", "j", bs)
    b_blocks = pack(b.with_names("j", "k").df, "j", "k", bs).select(
        F.col("br").alias("b_br"),
        F.col("bc").alias("b_bc"),
        F.col("ps").alias("b_ps"),
        F.col("vs").alias("b_vs"),
    )

    pairs = a_blocks.join(b_blocks, a_blocks.bc == b_blocks.b_br)

    # Self-contained Arrow kernels (no package globals — cloudpickle
    # ships them by value; workers need nothing on sys.path). These
    # were mapInPandas/applyInPandas; the Arrow rewrite is worth 6×
    # wall on the 4000×4000 bench because the pandas crossing turned
    # every 250k-double block into 250k Python float objects twice
    # (`.tolist()` out, object-Series in). Here block values travel
    # Arrow buffer -> np.frombuffer view -> GEMM -> one ListArray —
    # zero per-element Python objects in either direction.
    def gemm(batches):
        import numpy as np
        import pyarrow as pa

        nn = bs * bs
        # Emit output in bounded chunks, never one batch-sized array:
        # ListArray offsets are int32, so a single yielded batch must
        # keep rows*bs² < 2^31 (a full default 10k-row Arrow batch at
        # bs=500 is 2.5e9 elements — over the cliff), and chunking
        # also bounds the np.concatenate double-buffering to ~256 MB.
        rows_per_chunk = max(1, (1 << 25) // nn)
        for rb in batches:
            for start in range(0, rb.num_rows, rows_per_chunk):
                chunk = rb.slice(start, rows_per_chunk)
                col = {
                    nm: chunk.column(i)
                    for i, nm in enumerate(chunk.schema.names)
                }
                bi_out, bk_out, blocks = [], [], []
                for r in range(chunk.num_rows):
                    # np.bincount, not fancy-index assignment:
                    # duplicate (i, j) entries must SUM (matching the
                    # join+agg multiply), not last-write-win. bincount
                    # adds in array order and pack() sorts the cells,
                    # so the sum order is deterministic under any
                    # shuffle.
                    A = np.bincount(
                        col["ps"][r].values.to_numpy(),
                        weights=col["vs"][r].values.to_numpy(),
                        minlength=nn,
                    )
                    B = np.bincount(
                        col["b_ps"][r].values.to_numpy(),
                        weights=col["b_vs"][r].values.to_numpy(),
                        minlength=nn,
                    )
                    blocks.append(
                        (A.reshape(bs, bs) @ B.reshape(bs, bs)).ravel()
                    )
                    bi_out.append(col["br"][r].as_py())
                    bk_out.append(col["b_bc"][r].as_py())
                flat = np.concatenate(blocks)
                offsets = np.arange(
                    0, (len(blocks) + 1) * nn, nn, dtype=np.int64
                )
                la = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(flat, pa.float64())
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(bi_out, pa.int64()),
                        pa.array(bk_out, pa.int64()),
                        la,
                    ],
                    ["bi", "bk", "block"],
                )

    partial_schema = "bi long, bk long, block array<double>"
    partials = pairs.mapInArrow(gemm, partial_schema)

    summed = partials.groupBy("bi", "bk").applyInArrow(
        _make_block_sum(bs), partial_schema
    )

    # stage 4: explode flat blocks back to COO, dropping zeros (map-side)
    out = (
        summed.select(
            "bi",
            "bk",
            F.posexplode("block").alias("pos", "v"),
        )
        .filter(F.col("v") != 0.0)
        .select(
            (F.col("bi") * bs + (F.col("pos") / bs).cast("long")).alias("i"),
            (F.col("bk") * bs + F.col("pos") % bs).alias("j"),
            "v",
        )
    )
    return CooMatrix(out, a.n_rows, b.n_cols)


def _make_block_sum(bs: int):
    """Array-sum kernel for partial product blocks (self-contained,
    applyInArrow): flattens each Arrow chunk's list column into one
    contiguous float64 buffer and row-sums it as a (n_partials, bs²)
    matrix — partial order within a group is the shuffle arrival
    order, which is fine because the partials are exact products of
    integer-valued inputs (see module docstring)."""

    def block_sum(key, tbl):
        import numpy as np
        import pyarrow as pa

        nn = bs * bs
        total = np.zeros(nn)
        col = tbl.column("block")
        for chunk in col.chunks if hasattr(col, "chunks") else [col]:
            total += chunk.flatten().to_numpy().reshape(-1, nn).sum(axis=0)
        la = pa.ListArray.from_arrays(
            pa.array([0, nn], pa.int32()), pa.array(total, pa.float64())
        )
        return pa.Table.from_arrays(
            [
                pa.array([key[0]], pa.int64()),
                pa.array([key[1]], pa.int64()),
                la,
            ],
            ["bi", "bk", "block"],
        )

    return block_sum


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
