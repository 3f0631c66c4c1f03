"""Round-7 adjudication experiment for the 4000x4000 block-matmul
bench spread (VERDICT r6 #1: driver reps [85.7, 124.0, 37.6] s vs the
~28 s standalone-warm claim).

Runs, in ONE session, the candidate protocols interleaved so era drift
cannot masquerade as a protocol effect:

  A: current bench protocol — lazy gen_matrix inputs, re-executed per
     rep (gen cost + 16M-struct collect_list pack inside every rep).
  B: A + System.gc() before each rep (heap-state normalization).
  C: inputs staged to parquet once; reps read the staged files (gen
     excluded, pack still measured).

Prints one JSON line with all rep walls.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix_multiplication_map_reduce_gcp_spark.matrix.block import block_multiply
from matrix_multiplication_map_reduce_gcp_spark.matrix.coo import CooMatrix
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import gen_matrix, run_noop  # noqa: E402

N = int(os.environ.get("AB_N", "4000"))
BS = int(os.environ.get("AB_BS", "500"))
REPS = int(os.environ.get("AB_REPS", "3"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))


def main() -> None:
    spark = get_spark(app_name="ab_4000_block")
    # warm the Arrow kernel path like bench.py does
    run_noop(block_multiply(gen_matrix(spark, 40, 9), gen_matrix(spark, 40, 10), 20).df)

    stage_dir = "/tmp/ab4000_stage"
    a, b = gen_matrix(spark, N, seed=5), gen_matrix(spark, N, seed=6)
    a.df.write.mode("overwrite").parquet(f"{stage_dir}/a")
    b.df.write.mode("overwrite").parquet(f"{stage_dir}/b")
    a_st = CooMatrix(spark.read.parquet(f"{stage_dir}/a"), N, N)
    b_st = CooMatrix(spark.read.parquet(f"{stage_dir}/b"), N, N)

    def protoA():
        run_noop(block_multiply(a, b, block_size=BS).df)

    def protoB():
        spark._jvm.System.gc()
        time.sleep(1)
        run_noop(block_multiply(a, b, block_size=BS).df)

    def protoC():
        run_noop(block_multiply(a_st, b_st, block_size=BS).df)

    results: dict[str, list[float]] = {"A": [], "B": [], "C": []}
    for rnd in range(ROUNDS):
        for name, fn in (("A", protoA), ("B", protoB), ("C", protoC)):
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn()
                results[name].append(round(time.perf_counter() - t0, 2))
            print(f"round {rnd} proto {name}: {results[name][-REPS:]}",
                  file=sys.stderr)

    print(json.dumps({"n": N, "bs": BS, "reps": results}))


if __name__ == "__main__":
    main()
