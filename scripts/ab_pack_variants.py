"""Round-7 A/B: block-matmul pack-stage variants.

The pack stage (groupBy(br,bc).agg(sort_array(collect_list(struct)))
densifies entries into block rows. At 8000² that is 2×64M JVM structs
per rep — measured 11-24 s of in-rep GC even heap-drained, and the
sort_array comparator runs on 640k-element arrays. Variants:

  V0: current (collect_list(struct) + sort_array JVM-side).
  V1: collect_list(struct) WITHOUT sort_array; the gemm kernel
      np.lexsorts (ps, vs) before bincount — same deterministic
      duplicate-sum order, C-speed sort, no JVM comparator pass.
  V2: Arrow pack — repartition entries by (br, bc), mapInArrow
      densifies per partition with numpy (zero JVM agg state; the
      shuffle carries entry rows — same bytes, more rows).

All three must produce bit-identical results (asserted at 400²).
Prints one JSON line of interleaved rep walls + gc_ms at AB_N².
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.matrix.block import block_multiply
from matrix_multiplication_map_reduce_gcp_spark.matrix.coo import CooMatrix, validate_matmul_dims
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

from bench import gen_matrix, run_noop  # noqa: E402

N = int(os.environ.get("AB_N", "4000"))
BS = int(os.environ.get("AB_BS", "500"))
REPS = int(os.environ.get("AB_REPS", "3"))


def block_multiply_v(a, b, block_size, variant):
    """Variants of matrix/block.py::block_multiply sharing the gemm
    pipeline; see module docstring."""
    validate_matmul_dims(a.n_rows, a.n_cols, b.n_rows, b.n_cols)
    bs = block_size

    def pack_jvm(df, row, col, sort):
        pos = (F.col(row) % bs).cast("int") * bs + (F.col(col) % bs).cast("int")
        cells = F.collect_list(F.struct(pos.alias("p"), F.col("v")))
        if sort:
            cells = F.sort_array(cells)
        grouped = df.groupBy(
            (F.col(row) / bs).cast("long").alias("br"),
            (F.col(col) / bs).cast("long").alias("bc"),
        ).agg(cells.alias("cells"))
        return grouped.select(
            "br", "bc", F.col("cells.p").alias("ps"), F.col("cells.v").alias("vs")
        )

    def pack_arrow(df, row, col):
        pos = (F.col(row) % bs).cast("int") * bs + (F.col(col) % bs).cast("int")
        ent = df.select(
            (F.col(row) / bs).cast("long").alias("br"),
            (F.col(col) / bs).cast("long").alias("bc"),
            pos.alias("p"),
            "v",
        )
        nb = max(1, (a.n_rows // bs) * (a.n_cols // bs))
        ent = ent.repartition(min(nb, 256), "br", "bc")

        def densify(batches):
            import numpy as np
            import pyarrow as pa

            groups = {}
            for rb in batches:
                br = rb.column(0).to_numpy()
                bc = rb.column(1).to_numpy()
                p = rb.column(2).to_numpy()
                v = rb.column(3).to_numpy()
                key = br.astype(np.int64) << 32 | bc.astype(np.int64)
                order = np.argsort(key, kind="stable")
                key_s, p_s, v_s = key[order], p[order], v[order]
                cuts = np.flatnonzero(np.diff(key_s)) + 1
                for ks, ps, vs in zip(
                    np.split(key_s, cuts), np.split(p_s, cuts), np.split(v_s, cuts)
                ):
                    k = int(ks[0])
                    if k in groups:
                        groups[k][0].append(ps)
                        groups[k][1].append(vs)
                    else:
                        groups[k] = ([ps], [vs])
            import numpy as np  # noqa: F811
            import pyarrow as pa  # noqa: F811

            for k, (ps_l, vs_l) in groups.items():
                ps = np.concatenate(ps_l)
                vs = np.concatenate(vs_l)
                order = np.lexsort((vs, ps))
                ps, vs = ps[order], vs[order]
                off = pa.array([0, len(ps)], pa.int32())
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([k >> 32], pa.int64()),
                        pa.array([k & 0xFFFFFFFF], pa.int64()),
                        pa.ListArray.from_arrays(off, pa.array(ps, pa.int32())),
                        pa.ListArray.from_arrays(off, pa.array(vs, pa.float64())),
                    ],
                    ["br", "bc", "ps", "vs"],
                )

        return ent.mapInArrow(
            densify, "br long, bc long, ps array<int>, vs array<double>"
        )

    if variant == "V2":
        a_blocks = pack_arrow(a.with_names("i", "j").df, "i", "j")
        b_blocks = pack_arrow(b.with_names("j", "k").df, "j", "k")
    else:
        sort = variant == "V0"
        a_blocks = pack_jvm(a.with_names("i", "j").df, "i", "j", sort)
        b_blocks = pack_jvm(b.with_names("j", "k").df, "j", "k", sort)
    b_blocks = b_blocks.select(
        F.col("br").alias("b_br"),
        F.col("bc").alias("b_bc"),
        F.col("ps").alias("b_ps"),
        F.col("vs").alias("b_vs"),
    )
    pairs = a_blocks.join(b_blocks, a_blocks.bc == b_blocks.b_br)
    ksort = variant != "V0"

    def gemm(batches):
        import numpy as np
        import pyarrow as pa

        nn = bs * bs
        rows_per_chunk = max(1, (1 << 25) // nn)
        for rb in batches:
            for start in range(0, rb.num_rows, rows_per_chunk):
                chunk = rb.slice(start, rows_per_chunk)
                col = {nm: chunk.column(i) for i, nm in enumerate(chunk.schema.names)}
                bi_out, bk_out, blocks = [], [], []
                for r in range(chunk.num_rows):
                    def dense(pcol, vcol):
                        ps = col[pcol][r].values.to_numpy()
                        vs = col[vcol][r].values.to_numpy()
                        if ksort:
                            order = np.lexsort((vs, ps))
                            ps, vs = ps[order], vs[order]
                        return np.bincount(ps, weights=vs, minlength=nn)
                    A = dense("ps", "vs")
                    B = dense("b_ps", "b_vs")
                    blocks.append((A.reshape(bs, bs) @ B.reshape(bs, bs)).ravel())
                    bi_out.append(col["br"][r].as_py())
                    bk_out.append(col["b_bc"][r].as_py())
                flat = np.concatenate(blocks)
                offsets = np.arange(0, (len(blocks) + 1) * nn, nn, dtype=np.int64)
                la = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(flat, pa.float64())
                )
                yield pa.RecordBatch.from_arrays(
                    [pa.array(bi_out, pa.int64()), pa.array(bk_out, pa.int64()), la],
                    ["bi", "bk", "block"],
                )

    partials = pairs.mapInArrow(gemm, "bi long, bk long, block array<double>")
    from matrix_multiplication_map_reduce_gcp_spark.matrix.block import _make_block_sum

    summed = partials.groupBy("bi", "bk").applyInArrow(
        _make_block_sum(bs), "bi long, bk long, block array<double>"
    )
    out = (
        summed.select("bi", "bk", F.posexplode("block").alias("pos", "v"))
        .filter(F.col("v") != 0.0)
        .select(
            (F.col("bi") * bs + (F.col("pos") / bs).cast("long")).alias("i"),
            (F.col("bk") * bs + F.col("pos") % bs).alias("j"),
            "v",
        )
    )
    return CooMatrix(out, a.n_rows, b.n_cols)


def main() -> None:
    spark = get_spark(app_name="ab_pack")
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()

    def gc_ms():
        return sum(b.getCollectionTime() for b in beans)

    def drain():
        spark.catalog.clearCache()
        spark._jvm.System.gc(); time.sleep(1)
        spark._jvm.System.gc(); time.sleep(1)

    # Correctness: all variants bit-equal to the shipped path at 400².
    sa, sb = gen_matrix(spark, 400, seed=1), gen_matrix(spark, 400, seed=2)
    want = sorted(tuple(r) for r in block_multiply(sa, sb, 100).df.collect())
    for v in ("V0", "V1", "V2"):
        got = sorted(tuple(r) for r in block_multiply_v(sa, sb, 100, v).df.collect())
        assert got == want, f"{v} mismatch"
    print("all variants bit-equal at 400^2", file=sys.stderr)

    a, b = gen_matrix(spark, N, seed=5), gen_matrix(spark, N, seed=6)
    for v in ("V0", "V1", "V2"):  # untimed warm, each variant
        run_noop(block_multiply_v(a, b, BS, v).df)
    out = {v: [] for v in ("V0", "V1", "V2")}
    for _ in range(REPS):
        for v in ("V0", "V1", "V2"):
            drain()
            g0, t0 = gc_ms(), time.perf_counter()
            run_noop(block_multiply_v(a, b, BS, v).df)
            rep = {"wall": round(time.perf_counter() - t0, 2), "gc_ms": gc_ms() - g0}
            out[v].append(rep)
            print(f"{v}: {rep}", file=sys.stderr)
    print(json.dumps({"n": N, "bs": BS, "reps": out}))


if __name__ == "__main__":
    main()
