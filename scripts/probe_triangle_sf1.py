"""VERDICT r10 #4 probe: triangle_count_suppliers sf1 first-rep spill.

Times 4 consecutive reps at sf1 in one tuned session (no interleaving
— the question IS the rep-over-rep convergence), recording walls +
in-rep JVM GC, for the baseline and (via --alt) the restructured
first stage. Writes scripts/probe_triangle_sf1_result{,_alt}.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

from bench import jvm_gc_ms, run_noop  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/bench_sf1/sf1.0")


def main() -> None:
    alt = "--alt" in sys.argv
    spark = get_spark(app_name="probe_triangle_sf1")
    qs = registry.load_all()
    fn = qs["triangle_count_suppliers"].fn
    # sf0.01 + sf0.1 warmups (JIT tiering), as the heavy protocol does.
    run_noop(fn(spark, "/root/testdata/sf0.01"))
    run_noop(fn(spark, "/root/testdata/sf0.1"))
    walls, gcs = [], []
    for _ in range(4):
        g0 = jvm_gc_ms(spark)
        t0 = time.perf_counter()
        run_noop(fn(spark, SF1))
        walls.append(round(time.perf_counter() - t0, 2))
        gcs.append(jvm_gc_ms(spark) - g0)
    out = {"walls": walls, "gc_ms": gcs, "sf1_dir": SF1,
           "variant": "alt" if alt else "baseline"}
    name = "probe_triangle_sf1_result_alt.json" if alt else \
        "probe_triangle_sf1_result.json"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
