"""Round-12 OPTIMIZATION scale probe: sf0.1 -> sf1 wall ratios for
every query whose plan was restructured this round, proving the
rewrites kept (or improved) the 10x-data posture:

- semdedup/kmeans family: Lloyd assignment is now the Arrow/NumPy
  int64 GEMM at every K (map-only; adaptive K=312 at sf1 was already
  the GEMM path, so the ratio should hold or improve);
- LSH family: bucket_arrow replaces the interpreted plane-dot folds
  (map-only kernel — linear);
- PQ family: driver-trained bounded-sample codebook + one-pass Arrow
  code assignment (training is size-independent, assignment linear);
- sq8: fused normalize/code/dot Arrow pass (linear, corpus never
  shuffles);
- bpe: word-frequency (vocabulary-bounded) trainer;
- co-supply graph base (LPA): collect_set + map-side pair explode;
- market-basket: basket arrays + map-side C(k,2);
- zorder execute: single union write.

Median-of-3 after an sf0.01 + target-SF warm rep each, interleaved
order so every query samples the same eras (host-steal stalls show as
outlier walls; the committed walls arrays keep them visible). Writes
scripts/probe_r12_optim_result.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

from bench import run_noop  # noqa: E402

QUERIES = (
    "semdedup_keep_list",
    "kmeans_assignments",
    "knn_graph_lsh",
    "ann_lsh_topk",
    "ann_pq_rerank_topk",
    "ann_sq8_topk",
    "bpe_train_merges",
    "label_propagation_communities",
    "market_basket_pairs",
    "zorder_layout_execute",
)
SFS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/bench_sf1/sf1.0"}


def main() -> None:
    spark = get_spark(app_name="probe_r12_optim")
    qs = registry.load_all()
    out: dict[str, dict] = {n: {} for n in QUERIES}
    for label, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            for n in QUERIES:
                out[n][label] = "missing fixture"
            continue
        for n in QUERIES:
            run_noop(qs[n].fn(spark, "/root/testdata/sf0.01"))
            run_noop(qs[n].fn(spark, sf_dir))
        walls: dict[str, list[float]] = {n: [] for n in QUERIES}
        for _ in range(3):
            for n in QUERIES:
                t0 = time.perf_counter()
                run_noop(qs[n].fn(spark, sf_dir))
                walls[n].append(round(time.perf_counter() - t0, 3))
        for n in QUERIES:
            out[n][label] = {
                "walls": walls[n], "median": sorted(walls[n])[1]}
    for n in QUERIES:
        a, b = out[n].get("sf0.1"), out[n].get("sf1")
        if isinstance(a, dict) and isinstance(b, dict):
            out[n]["ratio_10x_data"] = round(b["median"] / a["median"], 2)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r12_optim_result.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
