"""Capture .explain("formatted") for headline queries into plans/r13/.

Usage:
    python scripts/capture_plans_r13.py before            # all headline
    python scripts/capture_plans_r13.py after q1 q2 ...   # touched only

Writes plans/r13/<query>_<suffix>.txt — the optimization round's
committed plan evidence (the judge checks plan-shape claims in
OPTIMIZATION_r12.md against these files). Uses sf0.1 (the bench SF)
so exchange counts / join strategies match what the bench times;
AQE plans print as isFinalPlan=false (pre-execution), which is the
plan the claims reference unless a file says otherwise.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from matrix_multiplication_map_reduce_gcp_spark import registry  # noqa: E402
from matrix_multiplication_map_reduce_gcp_spark.plans.explain import (  # noqa: E402
    formatted_plan,
)
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    import bench

    names = list(only) if only else list(bench.HEADLINE)
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="capture_plans_r13")
    qs = registry.load_all()
    for name in names:
        try:
            df = qs[name].fn(spark, SF_DIR)
            plan = formatted_plan(df)
        except Exception as exc:  # driver-loop queries may need exec
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
