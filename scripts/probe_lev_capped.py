"""Round-10 probe: is levenshtein_near_dup_pairs_capped's 7.3x wall at
10x data superlinear WORK, or linear compute on a fixed-core box?
(VERDICT r9 #4.)

The capped variant's candidate generator is _sn_neighbors — lead()
windows, m*WINDOW candidates per block of m, linear by construction —
so the hypothesis to kill is "candidate generation inside
sorted-neighborhood blocks grows quadratically with block occupancy".
Measure, per SF:
  * n_docs, n_blocks, max/mean block occupancy,
  * candidate count (rows out of the neighborhood expansion, BEFORE
    the levenshtein filter) — the work driver,
  * emitted pair count (after cap),
  * wall of the full query (median of 3, warmed).
If candidates ratio ~= docs ratio (~10x), the 7.3x wall is linear
work saturating 32 cores — an inherent-cost adjudication, not a plan
defect. Writes scripts/probe_lev_capped_result.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.dedup.queries import (
    LEN_BUCKET,
    LEV_PREFIX,
    LEV_SN_WINDOW,
    _sn_neighbors,
)
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

from bench import run_noop  # noqa: E402

SFS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/bench_sf1/sf1.0"}


def main() -> None:
    spark = get_spark(app_name="probe_lev_capped")
    queries = registry.load_all()
    out: dict[str, dict] = {}
    for label, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            out[label] = {"skipped": f"missing {sf_dir}"}
            continue
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "lang",
            (F.col("n_chars") / LEN_BUCKET).cast("bigint").alias("len_bucket"),
            F.substring("text", 1, LEV_PREFIX).alias("head"),
        )
        occ = (
            d.groupBy("lang", "len_bucket").count()
            .agg(
                F.count("*").alias("n_blocks"),
                F.max("count").alias("max_occ"),
                F.avg("count").alias("mean_occ"),
                F.sum("count").alias("n_docs"),
            )
            .collect()[0]
        )
        cands = _sn_neighbors(
            d,
            part_cols=("lang", "len_bucket"),
            order_cols=("head", "doc_id"),
            width=LEV_SN_WINDOW,
            lead_cols=("doc_id",),
            keep_cols=("doc_id",),
        ).count()
        fn = queries["levenshtein_near_dup_pairs_capped"].fn
        emitted = fn(spark, sf_dir).count()
        run_noop(fn(spark, sf_dir))  # warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_noop(fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
        out[label] = {
            "n_docs": occ["n_docs"], "n_blocks": occ["n_blocks"],
            "max_block_occupancy": occ["max_occ"],
            "mean_block_occupancy": round(occ["mean_occ"], 2),
            "candidates": cands, "emitted_pairs": emitted,
            "walls": walls, "wall_median": sorted(walls)[1],
        }
    if all(k in out and "candidates" in out[k] for k in SFS):
        a, b = out["sf0.1"], out["sf1"]
        out["ratios_sf1_over_sf0.1"] = {
            "docs": round(b["n_docs"] / a["n_docs"], 2),
            "candidates": round(b["candidates"] / a["candidates"], 2),
            "emitted": round(b["emitted_pairs"] / a["emitted_pairs"], 2),
            "wall": round(b["wall_median"] / a["wall_median"], 2),
        }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_lev_capped_result.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    time.sleep(1.0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
