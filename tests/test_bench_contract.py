"""bench.py's output contract is a round artifact: the driver records
its single stdout JSON line as BENCH_r{N}.json. Round 2 lost its
entire bench record to one unguarded exception — this test runs the
harness end-to-end (smoke subset) in a subprocess and pins the
contract so a bench regression fails the suite, not the round."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def bench_record():
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_SMOKE="1",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"bench must print exactly ONE line, got {lines}"
    return json.loads(lines[0])


@pytest.fixture(scope="module")
def merged_output():
    """The DRIVER's view of a bench run: stdout and stderr interleaved
    into one captured stream. BENCH_r07 recorded parsed:null because
    the canary's trailing streaming query (stream_tumbling_counts)
    left state-store shutdown noise AFTER the JSON line in exactly
    this merged view — the stdout-only fixture above could never catch
    it. The smoke subset runs the same 5-query canary (including the
    streaming query), so this reproduces the r7 failure shape; the
    quiesce in bench.py (StateStore.stop() + spark.stop() before the
    print) is what must keep the JSON line last."""
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_SMOKE="1",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stdout[-2000:]
    return proc.stdout


def test_last_combined_output_line_is_the_json_record(merged_output):
    lines = [ln for ln in merged_output.strip().splitlines() if ln.strip()]
    assert lines, "bench produced no output"
    record = json.loads(lines[-1])  # raises ⇒ the round loses its BENCH record
    assert record["metric"] == "headline_queries_total_wall"
    assert isinstance(record["queries"], dict) and record["queries"]
    canary = record.get("canary", {})
    assert "stream_tumbling_counts" in canary.get("end", {}), (
        "the merged-view pin must cover the streaming canary that "
        "produced the r7 post-JSON shutdown noise"
    )


def test_contract_keys_and_types(bench_record):
    r = bench_record
    assert r["metric"] == "headline_queries_total_wall"
    assert r["unit"] == "sec"
    assert isinstance(r["value"], (int, float)) and r["value"] > 0
    assert r["sf"] == 0.001
    assert isinstance(r["queries"], dict) and r["queries"]
    assert all(isinstance(v, (int, float)) for v in r["queries"].values())


def test_no_errors_and_not_partial(bench_record):
    assert "errors" not in bench_record, bench_record.get("errors")
    assert "partial" not in bench_record


def test_repetition_evidence_present(bench_record):
    """Median-of-3 queries must commit their raw walls (the evidence
    that adjudicates round-over-round deltas)."""
    reps = bench_record.get("repetitions", {})
    assert reps, "smoke subset includes REPEAT3 queries; reps missing"
    for name, walls in reps.items():
        # The documented protocol (SCALING.md) is median-of-3 — pinned
        # exactly so docs and harness can't drift apart (ADVICE r7).
        assert len(walls) == 3
        assert bench_record["queries"][name] == sorted(walls)[len(walls) // 2], name


def test_canary_pair_present(bench_record):
    """VERDICT r6 #5: every bench run commits the same 5-query canary
    timed at session start AND end, so era drift across rounds is
    measurable (compare start-to-start) instead of inferred."""
    canary = bench_record.get("canary")
    assert canary and set(canary) == {"start", "end"}
    expected = {"pricing_summary", "matmul", "dedup_exact",
                "ann_brute_force_topk", "stream_tumbling_counts"}
    for pos in ("start", "end"):
        assert set(canary[pos]) == expected
        assert all(v > 0 for v in canary[pos].values()), canary[pos]
