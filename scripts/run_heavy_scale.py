"""Assemble BENCH_SF1_r{N}.json: the heavy-scale group at sf0.1 and
sf1 with per-query 10x ratios.

Runs `python bench.py` twice with SPARK_GRAFT_BENCH_GROUP=heavy
(median-of-3 per query inside bench.py), parses the compact last-line
record of each, and writes the same artifact shape as BENCH_SF1_r09
(note + config + sf0.1 + sf1 + ratios). Usage:

    python scripts/run_heavy_scale.py --round 10 \
        --sf1-dir /tmp/bench_sf1/sf1.0
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_heavy(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_BENCH_GROUP="heavy",
               SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=7200,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py failed at {sf_dir}:\n"
                           f"{proc.stderr[-2000:]}")
    last = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(last)
    # Since the r11 wave-7 compact-line diet the line carries no
    # full_record pointer at all — the artifact lands at the FIXED
    # convention path bench_artifacts/bench_full_<mode>_sf<sf>.json.
    full_path = os.path.join(
        REPO, "bench_artifacts", f"bench_full_heavy_sf{rec['sf']}.json")
    with open(full_path) as fh:
        full = json.load(fh)
    # merge the evidence columns the compact line elides
    rec["canary"] = full.get("canary")
    rec["repetitions"] = full.get("repetitions")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1-dir", default="/tmp/bench_sf1/sf1.0")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    a = run_heavy(args.sf01_dir)
    b = run_heavy(args.sf1_dir)
    ratios = {
        q: round(b["queries"][q] / a["queries"][q], 1)
        for q in a["queries"]
        if q in b["queries"] and a["queries"][q] > 0
    }
    out = {
        "note": args.note or (
            f"Heavy-scale group (SPARK_GRAFT_BENCH_GROUP=heavy), "
            f"r{args.round}: sf0.1 then sf1 back-to-back via "
            f"scripts/run_heavy_scale.py; both records parsed from the "
            f"compact last line, repetitions/canaries merged from the "
            f"per-mode full-record files."
        ),
        "config": {"cpus": 32, "reps": "median-of-3 per query",
                   "warm": "all queries at sf0.01 first"},
        "sf0.1": a,
        "sf1": b,
        "ratios": ratios,
    }
    path = os.path.join(REPO, f"BENCH_SF1_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh)
    print(f"wrote {path}: sf0.1 {a['value']}s, sf1 {b['value']}s")


if __name__ == "__main__":
    main()
