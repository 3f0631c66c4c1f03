"""Round-7 adjudication of VERDICT r6 #3: embedding_near_dup_pairs_capped
measured 7.58 s median IN-SUITE (heavy group, 18th of 22 queries) vs
2.06 s standalone at sf0.1 — the builder blamed session state but had
no proof. One session, three measurement points, per-rep GC-time
attribution (GarbageCollectorMXBeans):

  P1: triple right after the heavy-group warmup (position "first");
  P2: triple after running the 17 heavy queries that precede it in
      HEAVY_SCALE order (position "seventeenth" — the bench's shape);
  P3: same position, but after a full heap drain (clearCache + double
      System.gc + sleeps).

If P2 >> P1 and P3 ≈ P1, the in-suite inflation is session heap debt
(same mechanism the 4000-block adjudication proved) and the heavy
group should adopt per-rep gc hygiene; if P2 ≈ P3 >> P1, the cost is
live state (codegen cache growth), which gc cannot reclaim.

Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

from bench import HEAVY_SCALE, run_noop  # noqa: E402

TARGET = "embedding_near_dup_pairs_capped"
SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="ab_embcap")
    queries = registry.load_all()
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())

    def gc_ms() -> int:
        return sum(b.getCollectionTime() for b in beans)

    def drain() -> None:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(1.0)
        spark._jvm.System.gc()
        time.sleep(1.0)

    def triple() -> list[dict[str, float]]:
        out = []
        for _ in range(3):
            g0, t0 = gc_ms(), time.perf_counter()
            run_noop(queries[TARGET].fn(spark, SF))
            out.append({"wall": round(time.perf_counter() - t0, 2),
                        "gc_ms": gc_ms() - g0})
        return out

    # Heavy-group warmup protocol (bench.py): every heavy query once
    # at sf0.01 so JIT tiering is settled before ANY measurement.
    for name in HEAVY_SCALE:
        run_noop(queries[name].fn(spark, "/root/testdata/sf0.01"))

    p1 = triple()
    print(f"P1 (first): {p1}", file=sys.stderr)

    preceding = HEAVY_SCALE[: HEAVY_SCALE.index(TARGET)]
    for name in preceding:
        run_noop(queries[name].fn(spark, SF))
    p2 = triple()
    print(f"P2 (after {len(preceding)} heavy queries): {p2}", file=sys.stderr)

    drain()
    p3 = triple()
    print(f"P3 (same position, drained): {p3}", file=sys.stderr)

    print(json.dumps({"P1_first": p1, "P2_insuite": p2, "P3_drained": p3}))


if __name__ == "__main__":
    main()
