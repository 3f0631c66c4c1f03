"""Round-8: decide the 4000-block spread bar from data (VERDICT r7 #2).

SCALING.md's declared bar is "median <=60 s, spread <=1.5x" but the r7
validated triple was [10.4, 18.9, 9.4] = 2.0x spread with gc_ms
[1674, 3857, 1059]. Two candidate resolutions:
  (a) a STRONGER per-rep drain holds raw spread <=1.5x, or
  (b) the bar must be restated on the gc-adjusted wall
      (wall - in_rep_gc_ms/1000), which bench.py now commits.

Interleaved same-session A/B (the only trustworthy comparison shape in
this environment - see memory: era drift up to 1.6x between sessions):
  arm gc2: the shipped drain (clearCache + 2x System.gc + 1 s sleeps)
  arm gc3: stronger (clearCache + 3x System.gc + 2 s sleeps +
           explicit ContextCleaner nudge via a second clearCache)
Each arm gets 3 interleaved triples after one untimed warm rep, with
per-rep wall + in-rep gc_ms, so both raw and gc-adjusted spreads are
computable per triple. Prints one JSON line.
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

# Dirty the heap like the real bench: the heavy headline prefix.
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
    spark = get_spark(app_name="ab_4000_spread")
    queries = registry.load_all()
    sf_dir = "/root/testdata/sf0.1"
    for name in DIRTY:
        run_noop(queries[name].fn(spark, sf_dir))
    run_noop(block_multiply(gen_matrix(spark, 40, 9), gen_matrix(spark, 40, 10), 20).df)
    a4, b4 = gen_matrix(spark, 4000, seed=5), gen_matrix(spark, 4000, seed=6)

    def drain(level: str) -> None:
        spark.catalog.clearCache()
        passes, pause = (2, 1.0) if level == "gc2" else (3, 2.0)
        for _ in range(passes):
            spark._jvm.System.gc()
            time.sleep(pause)
        if level == "gc3":
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(pause)

    # One untimed warm rep (JIT tiering at full size), as bench.py does.
    drain("gc2")
    run_noop(block_multiply(a4, b4, block_size=500).df)

    out: dict[str, list[list[dict[str, float]]]] = {"gc2": [], "gc3": []}
    for _round in range(3):
        for level in ("gc2", "gc3"):
            triple = []
            for _ in range(3):
                drain(level)
                g0, t0 = gc_ms(spark), time.perf_counter()
                run_noop(block_multiply(a4, b4, block_size=500).df)
                wall = round(time.perf_counter() - t0, 2)
                rep = {"wall": wall, "gc_ms": gc_ms(spark) - g0}
                rep["adj"] = round(wall - rep["gc_ms"] / 1000.0, 2)
                triple.append(rep)
                print(f"round {_round} {level}: {rep}", file=sys.stderr)
            out[level].append(triple)

    def spreads(arm):
        raw, adj = [], []
        for triple in out[arm]:
            w = sorted(r["wall"] for r in triple)
            a = sorted(r["adj"] for r in triple)
            raw.append(round(w[-1] / w[0], 2))
            adj.append(round(a[-1] / a[0], 2))
        return {"raw_spread": raw, "adj_spread": adj}

    print(json.dumps({"reps": out,
                      "gc2": spreads("gc2"), "gc3": spreads("gc3")}))


if __name__ == "__main__":
    main()
