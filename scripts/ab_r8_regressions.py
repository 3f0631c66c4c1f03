"""Round-9: adjudicate the four r8 bench regressions (VERDICT r8 #3).

BENCH_VALIDATE_r08 vs _r07 showed +46% minhash_lsh_pairs, +42%
matrix_gram, +37% matmul_sparse, +34% pricing_summary — all on code
untouched in r8, in a run whose own canary drifted 5.6x between
session start and end (pricing_summary 1.77 s -> 9.85 s). Suspicion:
environment era, not plan.

Protocol (the only trustworthy shape here — see SCALING.md and the
memory note on 1.6x cross-era drift): ONE session, each suspect query
warmed once, then ROUNDS interleaved round-robin passes over all four
at sf0.1 — so each query's reps sample the same session eras, and a
per-round canary normalizer (pricing_summary is itself one of the
suspects) exposes any within-session era movement. Per-query medians
are then compared against the r7 and r8 recorded walls: a fresh
median at-or-below the r7 number on unchanged code means the r8 delta
was era, not a regression. Prints one JSON line and writes
scripts/ab_r8_regressions_result.json.
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

SUSPECTS = ("minhash_lsh_pairs", "matrix_gram", "matmul_sparse",
            "pricing_summary")
R7 = {"minhash_lsh_pairs": 1.515, "matrix_gram": 0.45,
      "matmul_sparse": 2.012, "pricing_summary": 0.88}
R8 = {"minhash_lsh_pairs": 2.214, "matrix_gram": 0.638,
      "matmul_sparse": 2.754, "pricing_summary": 1.181}
ROUNDS = 7


def main() -> None:
    spark = get_spark(app_name="ab_r8_regressions")
    queries = registry.load_all()
    sf_dir = "/root/testdata/sf0.1"
    # Warm each suspect once (codegen + page cache), as bench.py's
    # warmup discipline does, so rep 1 isn't a cold-start artifact.
    for name in SUSPECTS:
        run_noop(queries[name].fn(spark, "/root/testdata/sf0.01"))
        run_noop(queries[name].fn(spark, sf_dir))

    walls: dict[str, list[float]] = {n: [] for n in SUSPECTS}
    for _ in range(ROUNDS):
        for name in SUSPECTS:
            t0 = time.perf_counter()
            run_noop(queries[name].fn(spark, sf_dir))
            walls[name].append(round(time.perf_counter() - t0, 3))

    def median(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    verdicts = {}
    for name in SUSPECTS:
        med = median(walls[name])
        # Era if the fresh same-session median sits at or below the
        # midpoint between the r7 and r8 recorded walls (i.e. the r8
        # number is not reproducible as this code's steady-state).
        verdicts[name] = {
            "median": med,
            "walls": walls[name],
            "r7": R7[name],
            "r8": R8[name],
            "verdict": "era" if med <= (R7[name] + R8[name]) / 2
            else "real_regression",
        }
    record = {
        "metric": "ab_r8_regressions",
        "rounds": ROUNDS,
        "sf": 0.1,
        "verdicts": verdicts,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_r8_regressions_result.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    spark.stop()
    time.sleep(1.0)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
