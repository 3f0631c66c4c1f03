"""Reference-parity benchmark chart (no matplotlib in this container —
hand-rolled SVG, same spirit as the reference's test/test.py:128-161
``plot_results`` which plotted MapReduce vs VM wall times).

Three curves over the reference's published matrix-size ladder
(BASELINE.md): the reference's Cloud-Functions MapReduce, its NumPy VM
oracle, and this engine's distributed dense matmul from the latest
bench timings. Log-scale y (values span 0.3 s .. 46.1 s).

Usage: python scripts/plot_bench.py [BENCH.json] [out.svg]
Also imported by bench.py to regenerate the artifact on every run.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

# BASELINE.md rows (reference test/performance_comparison.png labels).
SIZES = (4, 10, 50, 100, 200)
REF_MAPREDUCE = (3.0, 6.2, 27.8, 35.5, 46.1)
REF_VM_NUMPY = (0.3, 0.5, 0.6, 0.5, 0.7)

W, H = 720, 460
ML, MR, MT, MB = 70, 30, 50, 60  # margins


def _xy(i: int, v: float, lo: float, hi: float) -> tuple[float, float]:
    x = ML + i * (W - ML - MR) / (len(SIZES) - 1)
    y = H - MB - (math.log10(v) - lo) / (hi - lo) * (H - MT - MB)
    return x, y


def _polyline(vals, lo, hi, color, label) -> str:
    pts = " ".join(
        f"{x:.1f},{y:.1f}" for x, y in (_xy(i, v, lo, hi) for i, v in enumerate(vals))
    )
    dots = "".join(
        f'<circle cx="{x:.1f}" cy="{y:.1f}" r="3.5" fill="{color}"/>'
        f'<text x="{x:.1f}" y="{y - 8:.1f}" text-anchor="middle" '
        f'font-size="10" fill="{color}">{v:g}</text>'
        for (x, y), v in (( _xy(i, v, lo, hi), v) for i, v in enumerate(vals))
    )
    return (
        f'<polyline points="{pts}" fill="none" stroke="{color}" stroke-width="2"/>'
        + dots
    )


def render(ours: dict[int, float]) -> str:
    our_vals = tuple(ours[n] for n in SIZES)
    allv = REF_MAPREDUCE + REF_VM_NUMPY + our_vals
    lo = math.floor(math.log10(min(allv)) * 2) / 2
    hi = math.ceil(math.log10(max(allv)) * 2) / 2
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}" font-family="sans-serif">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        '<text x="360" y="24" text-anchor="middle" font-size="15" fill="#222">'
        "Dense matmul C = A(n×n)·B(n×n): reference vs this engine</text>",
        '<text x="360" y="40" text-anchor="middle" font-size="11" fill="#666">'
        "reference numbers from BASELINE.md; ours from bench.py on local[32], "
        "full scan+shuffle plan</text>",
    ]
    # y grid (log decades + halves)
    tick = lo
    while tick <= hi + 1e-9:
        v = 10**tick
        _, y = _xy(0, v, lo, hi)
        parts.append(
            f'<line x1="{ML}" y1="{y:.1f}" x2="{W - MR}" y2="{y:.1f}" '
            'stroke="#ddd" stroke-width="1"/>'
            f'<text x="{ML - 8}" y="{y + 4:.1f}" text-anchor="end" '
            f'font-size="11" fill="#444">{v:g}s</text>'
        )
        tick += 0.5
    for i, n in enumerate(SIZES):
        x, _ = _xy(i, 1, lo, hi)
        parts.append(
            f'<text x="{x:.1f}" y="{H - MB + 20}" text-anchor="middle" '
            f'font-size="12" fill="#444">{n}×{n}</text>'
        )
    parts.append(
        f'<text x="{(ML + W - MR) / 2}" y="{H - 12}" text-anchor="middle" '
        'font-size="12" fill="#444">matrix size n (log-scale wall time)</text>'
    )
    series = [
        (REF_MAPREDUCE, "#c0392b", "reference MapReduce (Cloud Functions)"),
        (REF_VM_NUMPY, "#7f8c8d", "reference VM NumPy (compute only)"),
        (our_vals, "#2471a3", "this engine (Spark local[32])"),
    ]
    for vals, color, _ in series:
        parts.append(_polyline(vals, lo, hi, color, _))
    for k, (_, color, label) in enumerate(series):
        y = MT + 10 + 16 * k
        parts.append(
            f'<line x1="{ML + 12}" y1="{y}" x2="{ML + 40}" y2="{y}" '
            f'stroke="{color}" stroke-width="2"/>'
            f'<text x="{ML + 46}" y="{y + 4}" font-size="11" fill="#333">{label}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def write_from_timings(timings: dict[str, float], out: str | Path) -> None:
    ours = {n: timings[f"matmul_dense_{n}"] for n in SIZES}
    Path(out).write_text(render(ours))


if __name__ == "__main__":
    bench = Path(sys.argv[1] if len(sys.argv) > 1 else "BENCH_r01.json")
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "benchmark_comparison.svg")
    payload = json.loads(bench.read_text())
    if "queries" not in payload:
        # driver wrapper: {"n", "rc", "tail", "parsed", ...} where
        # "parsed" (or the tail's last line) is bench.py's JSON line
        payload = payload.get("parsed") or json.loads(
            payload["tail"].strip().splitlines()[-1]
        )
    write_from_timings(payload["queries"], out)
