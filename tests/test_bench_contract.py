"""bench.py's output contract is a round artifact: the driver records
its single stdout JSON line as BENCH_r{N}.json. Round 2 lost its
entire bench record to one unguarded exception; rounds 7 AND 8 lost
theirs to the driver's 2000-char tail capture (r7: streaming shutdown
noise after the line; r8: the line itself outgrew the window, so its
HEAD was truncated). This test runs the harness end-to-end (smoke
subset) in a subprocess and pins the full contract — compact stdout
line <1900 chars that parses from a 2000-char merged-stream tail,
full evidence (canary/reps/gc) in the bench_artifacts file — so a
bench regression fails the suite, not the round."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# The driver's capture window: it parses the LAST line of a 2000-char
# tail of merged stdout+stderr. The emitted line must fit with margin.
DRIVER_TAIL_CHARS = 2000
# r12: the driver contract forbids dropping `queries` entries, so the
# line carries all 66 (the r11 "core-only" diet was a contract
# regression); the budget moved 1900 -> 1950 — still under the
# 2000-char tail window — and the r11 `groups` sums moved to the
# full-record artifact to pay for it.
LINE_BUDGET = 1950


@pytest.fixture(scope="module")
def bench_run(tmp_path_factory):
    full_out = tmp_path_factory.mktemp("bench") / "bench_full.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_SMOKE="1",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_FULL_OUT=str(full_out),
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
    assert full_out.exists(), "full-record artifact was not written"
    return lines[0], json.loads(full_out.read_text())


@pytest.fixture(scope="module")
def bench_record(bench_run):
    """The compact stdout record (the driver's BENCH_r{N} view)."""
    return json.loads(bench_run[0])


@pytest.fixture(scope="module")
def full_record(bench_run):
    """The full evidence record from bench_artifacts."""
    return bench_run[1]


@pytest.fixture(scope="module")
def merged_output(tmp_path_factory):
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
        SPARK_GRAFT_BENCH_FULL_OUT=str(
            tmp_path_factory.mktemp("bench_merged") / "bench_full.json"),
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


def test_record_parses_from_driver_tail_window(merged_output):
    """The EXACT driver parse: last line of a 2000-char tail of the
    merged stream. r8's record was >2000 chars, so this very slice cut
    off its head — parsed:null. Pinned forever."""
    tail = merged_output[-DRIVER_TAIL_CHARS:]
    lines = [ln for ln in tail.strip().splitlines() if ln.strip()]
    assert lines, "bench produced no output in the tail window"
    record = json.loads(lines[-1])  # raises ⇒ the round loses BENCH
    assert record["metric"] == "headline_queries_total_wall"
    assert isinstance(record["queries"], dict) and record["queries"]


def test_last_combined_output_line_is_the_json_record(merged_output):
    lines = [ln for ln in merged_output.strip().splitlines() if ln.strip()]
    assert lines, "bench produced no output"
    record = json.loads(lines[-1])  # raises ⇒ the round loses its BENCH record
    assert record["metric"] == "headline_queries_total_wall"
    assert isinstance(record["queries"], dict) and record["queries"]


def test_emitted_line_fits_driver_window(bench_run):
    """The compact line must stay under the driver's capture window
    with margin. The smoke subset emits ~3 queries; extrapolate to the
    full 44-query headline by measuring the real per-entry cost."""
    line, _ = bench_run
    assert len(line) < LINE_BUDGET, len(line)
    # Full-headline extrapolation: rebuild the compact line with EVERY
    # headline + ladder + block query name (the contract forbids
    # dropping any) at worst-case realistic 1-dp widths (99.9 — a
    # query at ≥100 s is a failed round regardless of line length).
    import bench as bench_mod

    record = json.loads(line)
    all_names = (
        list(bench_mod.HEADLINE)
        + [f"matmul_dense_{n}" for n in (4, 10, 50, 100, 200)]
        + ["matmul_dense_1000_block", "matmul_dense_4000_block"]
    )
    projected = dict(
        record,
        queries={name: 99.9 for name in all_names},  # worst 1-dp width
    )
    projected_len = len(json.dumps(projected, separators=(",", ":")))
    assert projected_len < LINE_BUDGET, (
        f"full-headline projection {projected_len} chars would overflow "
        f"the driver tail window"
    )
    # Catastrophic-width projection (every value 999.9, i.e. every
    # query ≥100 s — a failed round regardless): the emitted line must
    # STILL fit the driver window and keep every `queries` entry; the
    # degradation ladder may pay for that by dropping the canary pair,
    # never the queries map.
    projected = dict(
        record, queries={name: 999.9 for name in all_names})
    line2 = bench_mod.compact_line(projected)
    assert len(line2) < DRIVER_TAIL_CHARS
    assert set(json.loads(line2)["queries"]) == set(all_names)


def test_contract_keys_and_types(bench_record):
    r = bench_record
    assert r["metric"] == "headline_queries_total_wall"
    assert r["unit"] == "sec"
    assert isinstance(r["value"], (int, float)) and r["value"] > 0
    assert r["sf"] == 0.001
    assert isinstance(r["queries"], dict) and r["queries"]
    assert all(isinstance(v, (int, float)) for v in r["queries"].values())
    # r12: the compact line is EXACTLY the driver contract — the r11
    # `groups` sums live in the full record (bench_artifacts/
    # bench_full_<mode>_sf<sf>.json, the fixed convention the ab_*
    # drift tooling reads). r13 adds the 2-value stall-discriminator
    # canary (VERDICT r12 #2): pricing_summary's wall at session start
    # and end, so PERF can mark era-contaminated records.
    assert set(r) == {"metric", "value", "unit", "queries", "sf", "canary"}
    assert isinstance(r["canary"], list) and len(r["canary"]) == 2
    assert all(isinstance(v, (int, float)) and v > 0 for v in r["canary"])


def test_no_errors_and_not_partial(bench_record, full_record):
    assert "partial" not in bench_record
    assert "errors" not in full_record, full_record.get("errors")
    assert "partial" not in full_record


def test_headline_value_excludes_unstable_block_matmul(full_record):
    """VERDICT r8 #2: matmul_dense_4000_block's wall swings 3-10×
    across JVM heap eras; summing it lets one era move the headline
    ±15%. The record declares the exclusion and the value must honor
    it (smoke mode doesn't run the 4000 block — the declared list is
    intersected with what actually ran, and the arithmetic is pinned
    either way)."""
    excl = set(full_record["excluded_from_value"])
    assert excl <= {"matmul_dense_4000_block"}
    expected = round(
        sum(v for k, v in full_record["queries"].items() if k not in excl), 3)
    assert abs(full_record["value"] - expected) < 1e-6


def test_full_record_carries_the_evidence(full_record):
    """Canary pairs, raw repetition walls, and (when the block matmuls
    run) gc attribution live in the FILE artifact now — the stdout
    line only carries per-query medians. Median-of-3 queries must
    commit their raw walls (the evidence that adjudicates
    round-over-round deltas)."""
    reps = full_record.get("repetitions", {})
    assert reps, "smoke subset includes REPEAT3 queries; reps missing"
    for name, walls in reps.items():
        # The documented protocol (SCALING.md) is median-of-3 — pinned
        # exactly so docs and harness can't drift apart (ADVICE r7).
        assert len(walls) == 3
        assert full_record["queries"][name] == sorted(walls)[len(walls) // 2], name

    canary = full_record.get("canary")
    assert canary and set(canary) == {"start", "end"}
    expected = {"pricing_summary", "matmul", "dedup_exact",
                "ann_brute_force_topk", "stream_tumbling_counts"}
    for pos in ("start", "end"):
        assert set(canary[pos]) == expected
        assert all(v > 0 for v in canary[pos].values()), canary[pos]
    assert "stream_tumbling_counts" in canary["end"], (
        "the canary must keep covering the streaming query that "
        "produced the r7 post-JSON shutdown noise"
    )


def test_compact_queries_match_full_medians(bench_record, full_record):
    """The compact line's per-query values are the full record's
    medians rounded to 1 dp — ALL names, no silent drops (the driver
    contract forbids removing entries; the r11 core-only diet was a
    regression caught in r12). The core/ladder group sums live in the
    full record and must partition `value` exactly."""
    assert set(bench_record["queries"]) == set(full_record["queries"])
    for name, v in bench_record["queries"].items():
        assert v == round(full_record["queries"][name], 1), name
    fg = full_record["groups"]
    excl = set(full_record["excluded_from_value"])
    assert abs(fg["core"] + fg["ladder"] - full_record["value"]) < 1e-6
    lad = round(
        sum(v for k, v in full_record["queries"].items()
            if (k.startswith("multimodal_") or k == "stream_avc_ingest")
            and k not in excl), 3)
    assert abs(fg["ladder"] - lad) < 1e-6


def test_all_inclusive_sum_is_emitted(bench_record, full_record):
    """ADVICE r9: `value` excludes the unstable 4000² block since r9
    while r1-r8 included it — the FULL record must carry the
    all-inclusive sum (the compact line dropped its copy in the r11
    diet; cross-round tooling reads the full artifact, which every
    compact record points at via full_record)."""
    expected = round(sum(full_record["queries"].values()), 3)
    assert abs(full_record["value_with_excluded"] - expected) < 1e-6
    assert "value_with_excluded" not in bench_record  # dieted away


def test_compact_line_degradation_ladder():
    """ADVICE r12 (high): the old backstop fired at >=1900 chars and
    dropped the ENTIRE queries map — inside the supported worst-case
    projection band (1916-1946 chars), i.e. exactly the contract
    regression it existed to prevent. Pin the r13 ladder on real-shaped
    records in each band:

      - 1900-1950 chars: emitted unchanged, queries intact (the band
        the old backstop would have destroyed);
      - just over LINE_HARD_BUDGET: canary dropped, queries intact;
      - truly unfittable even without canary: queries dropped last.
    """
    import bench as bench_mod

    def make(n_queries, val, canary=True):
        r = {
            "metric": "headline_queries_total_wall",
            "value": 123.456,
            "unit": "sec",
            "queries": {f"q_{i:02d}_padded_name_xx": val
                        for i in range(n_queries)},
            "sf": 0.1,
        }
        if canary:
            r["canary"] = [5.56, 1.55]
        return r

    # Band 1: binary-search a record into the 1900-1950 window.
    for n in range(50, 80):
        rec = make(n, 99.9)
        raw = json.dumps(rec, separators=(",", ":"))
        if 1900 <= len(raw) < 1950:
            line = bench_mod.compact_line(rec)
            assert line == raw, "in-budget record must emit unchanged"
            assert len(json.loads(line)["queries"]) == n
            break
    else:  # pragma: no cover
        raise AssertionError("could not construct a 1900-1950 record")

    # Band 2: just over the hard budget — canary goes, queries stay.
    for n in range(60, 90):
        rec = make(n, 999.9)
        raw = json.dumps(rec, separators=(",", ":"))
        # Dropping the 22-char canary must land the line back under the
        # budget, so any raw length in [budget, budget+22) exercises
        # exactly the canary-drop rung.
        if bench_mod.LINE_HARD_BUDGET <= len(raw) \
                < bench_mod.LINE_HARD_BUDGET + 22:
            line = bench_mod.compact_line(rec)
            parsed = json.loads(line)
            assert len(line) < bench_mod.LINE_HARD_BUDGET
            assert "canary" not in parsed
            assert len(parsed["queries"]) == n
            break
    else:  # pragma: no cover
        raise AssertionError("could not construct a just-over record")

    # Band 3: unfittable even without the canary — queries dropped,
    # record still parseable and under the window.
    rec = make(200, 9999.9)
    line = bench_mod.compact_line(rec)
    parsed = json.loads(line)
    assert len(line) < bench_mod.DRIVER_TAIL_CHARS
    assert "queries" not in parsed
    assert parsed["metric"] == "headline_queries_total_wall"


def test_full_record_rep_spread(full_record):
    """VERDICT r12 #2: per-query max/median rep-spread flags let PERF
    self-diagnose host-steal contamination (r12 carried single reps of
    28-143 s beside 2-4 s neighbours with no machine-readable marker).
    Every repetitions entry gets one; values are max/median."""
    reps = full_record.get("repetitions", {})
    spread = full_record.get("rep_spread", {})
    assert set(spread) == set(reps)
    for name, walls in reps.items():
        med = sorted(walls)[len(walls) // 2]
        assert abs(spread[name] - round(max(walls) / med, 2)) < 1e-9, name
        assert spread[name] >= 1.0


def test_block4000_fresh_jvm_rep_contract(monkeypatch):
    """VERDICT r9 #3: the 4000² reps are subprocess-isolated fresh
    JVMs. Pin the child-mode contract at toy geometry (120², bs=60):
    the parent-side collector must get back a parseable one-line
    record with a wall and gc attribution — a child regression would
    otherwise cost the round its 4000² evidence silently."""
    import bench as bench_mod

    monkeypatch.setenv("SPARK_GRAFT_BENCH_BLOCK_N", "120")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BLOCK_SIZE", "60")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    walls, gcs, err = bench_mod.fresh_jvm_block4000_reps(reps=1)
    assert err == "", err
    assert len(walls) == 1 and walls[0] > 0
    assert len(gcs) == 1 and gcs[0] >= 0
