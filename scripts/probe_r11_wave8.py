"""Round-11 wave-4+5 scale probe: the new MPV1 motion + MAU1 audio rungs'
sf0.1 -> sf1 wall ratios (same-round rule — new capability gets its
10x-data number the round it ships).

Query: the decode-at-ingest stream — per-doc map-only codec work
inside micro-batches, so the expectation is the batch AVC rung's
linear compute-bound class plus a fixed streaming-engine overhead
(micro-batch planning + sink commit) that amortizes at scale. Median-of-3 after an
sf0.01 + target-SF warm rep each, one session, interleaved order so
every query samples the same eras. Writes
scripts/probe_r11_wave8_result.json.
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
    "stream_avc_ingest",
)
SFS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/bench_sf1/sf1.0"}


def main() -> None:
    spark = get_spark(app_name="probe_r11_wave8")
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
                        "probe_r11_wave8_result.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    time.sleep(1.0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
