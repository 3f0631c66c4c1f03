"""Round-12 wave-1 scale probe: the three new operators' sf0.1 -> sf1
wall ratios (same-round rule — new capability gets its 10x-data number
the round it ships).

Expectations: zorder_layout_execute is a double table rewrite + audit
(IO-bound, roughly linear in table size with a fixed 64-bucket
shuffle); stream_dedup_ingest is the stateful LSH ingest (shingle/
minhash map work linear in docs, band-join linear in collisions);
multimodal_avc_cavlc is the map-only CPU-bound codec class (linear,
the decode ratios partly reflect single-file input partitioning — see
the r12 multi-file probe). Median-of-3 after an sf0.01 + target-SF
warm rep each, one session, interleaved order so every query samples
the same eras. Writes scripts/probe_r12_wave1_result.json.
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
    "zorder_layout_execute",
    "stream_dedup_ingest",
    "multimodal_avc_cavlc",
)
SFS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/bench_sf1/sf1.0"}


def main() -> None:
    spark = get_spark(app_name="probe_r12_wave1")
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
                        "probe_r12_wave1_result.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
