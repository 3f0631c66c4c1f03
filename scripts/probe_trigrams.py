"""Round-9 scale probe for event_path_trigrams_topk (VERDICT r8 #7).

The query ratioed 10.4x wall for 10x data in BENCH_SF1_r08 — right at
the linear boundary, worst non-pair-emitter. Hypotheses:
  (a) the per-user window sort (the one Exchange+Sort) is the cost
      and crossed a spill/partition-size threshold at sf1, or
  (b) the trigram groupBy/top-k stages contribute superlinearly, or
  (c) it was era noise around small absolute numbers (0.38 s).

Probe: in ONE session, interleaved median-of-3 at sf0.1 and sf1 for
three nested sub-plans — window-only (sort + LEADs + filter),
window+groupBy (no top-k), and the full query — so the stagewise
ratios attribute the sf1 cost. Prints one JSON line and writes
scripts/probe_trigrams_result.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

from bench import run_noop  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/bench_sf1/sf1.0"


def subplans(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.substring("event_type", 1, 1).alias("ini"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = F.concat(
        F.col("ini"), F.lead("ini", 1).over(w), F.lead("ini", 2).over(w)
    )
    windowed = ev.select(tri.alias("trigram")).filter(
        F.col("trigram").isNotNull()
    )
    grouped = windowed.groupBy("trigram").agg(F.count("*").alias("n"))
    full = grouped.orderBy(F.desc("n"), "trigram").limit(10)
    return {"window_only": windowed, "window_group": grouped, "full": full}


def main() -> None:
    spark = get_spark(app_name="probe_trigrams")
    results: dict[str, dict[str, list[float]]] = {}
    # Warm both SFs once.
    for sf in (SF01, SF1):
        run_noop(subplans(spark, sf)["full"])
    for _ in range(3):  # interleaved reps: each rep visits every cell
        for sf, key in ((SF01, "sf0.1"), (SF1, "sf1")):
            plans = subplans(spark, sf)
            for name, df in plans.items():
                t0 = time.perf_counter()
                run_noop(df)
                results.setdefault(key, {}).setdefault(name, []).append(
                    round(time.perf_counter() - t0, 3)
                )

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    summary = {
        sf: {name: med(walls) for name, walls in d.items()}
        for sf, d in results.items()
    }
    ratios = {
        name: round(summary["sf1"][name] / max(summary["sf0.1"][name], 1e-9), 2)
        for name in summary["sf0.1"]
    }
    record = {
        "metric": "probe_event_path_trigrams",
        "medians": summary,
        "walls": results,
        "sf1_over_sf01": ratios,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe_trigrams_result.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    spark.stop()
    time.sleep(1.0)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
