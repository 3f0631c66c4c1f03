"""Per-query isolated timing for the r12 optimization loop.

Usage:
    python scripts/measure_r12.py q1 q2 ...  [--sf /root/testdata/sf0.1]
        [--reps 3] [--out scripts/measure_r12_<label>.json --label L]

Same methodology as bench.py's headline mode (guide §1.1/§1.4): one
tuned session, sf0.01 warm pass + one target-SF warm pass per query,
then interleaved median-of-N reps through the noop sink, jobs labeled
via setJobDescription. Interleaving means every query samples the same
session eras, so A/B deltas between two invocations of this script are
plan deltas, not era deltas.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from matrix_multiplication_map_reduce_gcp_spark import registry  # noqa: E402
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark  # noqa: E402


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="measure_r12")
    qs = registry.load_all()
    for n in args.queries:
        spark.sparkContext.setJobDescription(f"warm sf0.01: {n}")
        run_noop(qs[n].fn(spark, "/root/testdata/sf0.01"))
        spark.sparkContext.setJobDescription(f"warm target: {n}")
        run_noop(qs[n].fn(spark, args.sf))
    walls: dict[str, list[float]] = {n: [] for n in args.queries}
    for rep in range(args.reps):
        for n in args.queries:
            spark.sparkContext.setJobDescription(f"rep{rep}: {n}")
            t0 = time.perf_counter()
            run_noop(qs[n].fn(spark, args.sf))
            walls[n].append(round(time.perf_counter() - t0, 3))
    out = {
        n: {"walls": w, "median": sorted(w)[len(w) // 2]}
        for n, w in walls.items()
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
