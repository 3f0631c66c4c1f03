"""Round-11: adjudicate the two r10 validate-era drifts (VERDICT r10 #6).

1. `market_basket_pairs` — 2.44 -> 2.90 s validate-to-validate (+19%)
   on untouched code.
2. `label_propagation_communities` — 3.91 -> 4.46 s (+14%), same.

Protocol (SCALING.md ratio hygiene; memory note: 1.6x cross-era drift
makes only same-session interleaved A/Bs trustworthy): ONE session,
each suspect warmed at sf0.01 then sf0.1, then ROUNDS interleaved
round-robin passes at sf0.1 so every query samples the same session
eras. Verdict rule: "era" if the fresh median sits at or below the
midpoint of the two recorded walls (the higher number is not
reproducible as this code's steady state); else "real_regression".
Writes scripts/ab_r10_drifts_result.json and prints one JSON line.
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

# (low recorded wall, high recorded wall) per suspect:
#   semdedup: r9 validate vs r9 driver; the other two: r8 vs r9 validate.
RECORDED = {
    "market_basket_pairs": (2.44, 2.90),
    "label_propagation_communities": (3.91, 4.46),
}
ROUNDS = 7


def main() -> None:
    spark = get_spark(app_name="ab_r10_drifts")
    queries = registry.load_all()
    sf_dir = "/root/testdata/sf0.1"
    for name in RECORDED:
        run_noop(queries[name].fn(spark, "/root/testdata/sf0.01"))
        run_noop(queries[name].fn(spark, sf_dir))

    walls: dict[str, list[float]] = {n: [] for n in RECORDED}
    for _ in range(ROUNDS):
        for name in RECORDED:
            t0 = time.perf_counter()
            run_noop(queries[name].fn(spark, sf_dir))
            walls[name].append(round(time.perf_counter() - t0, 3))

    def median(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    verdicts = {}
    for name, (lo, hi) in RECORDED.items():
        med = median(walls[name])
        verdicts[name] = {
            "median": med,
            "walls": walls[name],
            "recorded_low": lo,
            "recorded_high": hi,
            "verdict": "era" if med <= (lo + hi) / 2 else "real_regression",
        }
    record = {
        "metric": "ab_r10_drifts",
        "rounds": ROUNDS,
        "sf": 0.1,
        "verdicts": verdicts,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_r10_drifts_result.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    spark.stop()
    time.sleep(1.0)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
