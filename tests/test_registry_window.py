"""Pins for the GENERATED driver window (matrix_multiplication_map_reduce_gcp_spark/window.py).

The window is a pure function of (registry order, CORRECTNESS_r*.json
evidence); these tests re-run that function on exactly the rounds the
committed window consumed (window.CONSUMED_ROUNDS) and assert the
committed tuple matches — hand-edits or stale rotations fail loudly,
while newly landed CORRECTNESS files don't break the suite (they only
change the NEXT `python scripts/rotate_window.py` run).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import rotate_window  # noqa: E402

from matrix_multiplication_map_reduce_gcp_spark import registry, window  # noqa: E402


def _regenerate():
    q = registry.load_all()
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    return rotate_window.propose_window(
        list(q), modules, list(window.CONSUMED_ROUNDS)
    )


def test_window_matches_evidence():
    proposed, deferred = _regenerate()
    assert tuple(proposed) == window.PRIORITY_PREFIX, (
        "window.py is stale or hand-edited — regenerate with "
        "`python scripts/rotate_window.py && python scripts/dump_registry.py`"
    )
    assert tuple(deferred) == window.DEFERRED


def test_backlog_drains_within_two_rotations():
    """Every registered query is scheduled for driver verification
    within two rounds: the deferred backlog must fit in one future
    window's fill capacity (window size minus one rep per module)."""
    q = registry.load_all()
    n_modules = len({qd.fn.__module__ for qd in q.values()})
    fill_capacity = rotate_window.WINDOW - n_modules
    assert len(window.DEFERRED) <= fill_capacity, (
        f"{len(window.DEFERRED)} deferred queries exceed one round's "
        f"fill capacity ({fill_capacity}) — backlog no longer drains "
        "within two rotations"
    )


def test_consumed_rounds_are_committed():
    for rnd in window.CONSUMED_ROUNDS:
        assert (REPO / f"CORRECTNESS_r{rnd:02d}.json").exists()


def test_rotation_maximizes_new_coverage():
    """Each slot not taken by a module anchor must verify a
    never-green query while any remain — the point of rotating."""
    green = rotate_window.green_queries(list(window.CONSUMED_ROUNDS))
    never_green_in = [n for n in window.PRIORITY_PREFIX if n not in green]
    assert len(never_green_in) + len(window.DEFERRED) == len(
        [n for n in registry.load_all() if n not in green]
    )
