"""Round-7 follow-up: attribute the residual 4000-block rep outliers.

The first A/B (ab_4000_block.py) showed forced GC + warm JIT gives a
stable ~11.5 s; but inside the FULL headline bench a 94 s rep still
appeared despite gc-before-rep. This experiment dirties the heap like
the real bench (a prefix of heavy headline queries at sf0.1), then
times 4000-block triples under two hygiene protocols while recording
the JVM's own GC-time counters per rep (GarbageCollectorMXBeans), so
wall = compute + GC can be decomposed with numbers.

  gc1: single System.gc() + 0.5 s sleep  (bench.py's r7 first cut)
  gc2: double System.gc() + 2.0 s sleep + catalog.clearCache()

Prints one JSON line: per-rep wall seconds and GC milliseconds.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.matrix.block import block_multiply
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

from bench import gen_matrix, run_noop  # noqa: E402

DIRTY = [
    "minhash_lsh_pairs", "dedup_incremental_lsh", "simhash_fingerprints",
    "ngram_jaccard_pairs", "ann_pq_rerank_topk", "semdedup_keep_list",
    "knn_graph_lsh", "label_propagation_communities",
    "market_basket_pairs", "cogroup_events_before_order",
]


def gc_ms(spark) -> int:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(b.getCollectionTime() for b in beans)


def main() -> None:
    spark = get_spark(app_name="ab_4000_gc")
    queries = registry.load_all()
    sf_dir = "/root/testdata/sf0.1"
    for name in DIRTY:
        run_noop(queries[name].fn(spark, sf_dir))
    run_noop(block_multiply(gen_matrix(spark, 40, 9), gen_matrix(spark, 40, 10), 20).df)
    a4, b4 = gen_matrix(spark, 4000, seed=5), gen_matrix(spark, 4000, seed=6)

    def hygiene(level: str) -> None:
        if level == "gc2":
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(1.0)
            spark._jvm.System.gc()
            time.sleep(1.0)
        else:
            spark._jvm.System.gc()
            time.sleep(0.5)

    out: dict[str, list[dict[str, float]]] = {"gc1": [], "gc2": []}
    for _round in range(3):
        for level in ("gc1", "gc2"):
            for _ in range(3):
                hygiene(level)
                g0, t0 = gc_ms(spark), time.perf_counter()
                run_noop(block_multiply(a4, b4, block_size=500).df)
                wall = round(time.perf_counter() - t0, 2)
                rep = {"wall": wall, "gc_ms": gc_ms(spark) - g0}
                out[level].append(rep)
                print(f"round {_round} {level}: {rep}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
