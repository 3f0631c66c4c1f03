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
    q = registry.canonical_queries()
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    return rotate_window.propose_window(
        list(q), modules, list(window.CONSUMED_ROUNDS)
    )


def test_canonical_order_ignores_import_history():
    """VERDICT r5 regression: importing query modules in a non-canonical
    order (as tests/test_r5_operators.py does) must not perturb the
    registry's canonical order — the window derivation sorts by the
    (module index, per-module sequence) key stamped at decoration, not
    by dict insertion order."""
    import importlib

    # Deliberately import two late modules first, as a subset pytest
    # invocation might. These imports REGISTER queries out of canonical
    # insertion order when run before any load_all() in this process;
    # when run after, they are idempotent no-ops — either way the
    # canonical listing below must be identical.
    importlib.import_module("matrix_multiplication_map_reduce_gcp_spark.text.curation")
    importlib.import_module(
        "matrix_multiplication_map_reduce_gcp_spark.operators.pagerank"
    )
    q = registry.canonical_queries()
    orders = [qd.order for qd in q.values()]
    assert orders == sorted(orders)
    mod_rank = {m: i for i, m in enumerate(registry._QUERY_MODULES)}
    mods = [mod_rank[qd.fn.__module__] for qd in q.values()]
    assert mods == sorted(mods), "canonical order must follow _QUERY_MODULES"
    proposed, deferred = _regenerate()
    assert tuple(proposed) == window.PRIORITY_PREFIX
    assert tuple(deferred) == window.DEFERRED


def test_window_matches_evidence():
    proposed, deferred = _regenerate()
    assert tuple(proposed) == window.PRIORITY_PREFIX, (
        "window.py is stale or hand-edited — regenerate with "
        "`python scripts/rotate_window.py && python scripts/dump_registry.py`"
    )
    assert tuple(deferred) == window.DEFERRED


DRAIN_HORIZON = 3  # windows (current + 2 future rotations)


def test_backlog_drains_within_horizon():
    """Every registered query gets driver-verified within
    DRAIN_HORIZON rounds: simulate successive rotations (each window
    assumed green) and assert the never-green backlog reaches zero.
    Exact simulation, not a capacity formula — deferred queries can
    themselves become module-rep anchors in a later window, which a
    (WINDOW - n_modules) bound undercounts. The horizon is what bounds
    how long a freshly registered query can wait; it only grows when
    a round registers more new queries than a window can absorb."""
    q = registry.canonical_queries()
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    green: tuple[str, ...] = ()
    for rotation in range(1, DRAIN_HORIZON + 1):
        win, deferred = (
            (list(window.PRIORITY_PREFIX), list(window.DEFERRED))
            if rotation == 1
            else rotate_window.propose_window(
                list(q), modules, list(window.CONSUMED_ROUNDS), extra_green=green
            )
        )
        if not deferred:
            return
        green = tuple(set(green) | set(win))
    raise AssertionError(
        f"backlog not drained after {DRAIN_HORIZON} windows; still "
        f"deferred: {deferred}"
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
        [n for n in registry.canonical_queries() if n not in green]
    )


def test_rotation_prefers_stalest_evidence(monkeypatch):
    """VERDICT r6 #4: with the never-green backlog drained, fill slots
    re-verify greens OLDEST-EVIDENCE-FIRST (latest green round asc,
    registration order as tiebreak). Synthetic evidence: two modules,
    everything green, ages mixed — the window must pick the stale
    names ahead of fresher, earlier-registered ones."""
    registered = ["matmul", "q_old1", "q_new1", "q_old2", "m2_new", "m2_old"]
    modules = {
        "matmul": "mod_a", "q_old1": "mod_a", "q_new1": "mod_a",
        "q_old2": "mod_a", "m2_new": "mod_b", "m2_old": "mod_b",
    }
    ages = {"matmul": 6, "q_old1": 1, "q_new1": 6, "q_old2": 2,
            "m2_new": 6, "m2_old": 1}
    monkeypatch.setattr(rotate_window, "green_by_round", lambda rounds: dict(ages))
    monkeypatch.setattr(rotate_window, "WINDOW", 4)
    win, deferred = rotate_window.propose_window(registered, modules, [6])
    assert deferred == []
    # matmul pinned; the three stale queries (last green rounds 1, 1,
    # 2 — all <= latest(6) - bound(ceil(6/4)=2), i.e. past the
    # staleness bound) claim their slots via the must-go pass in
    # (age, registration) order; the fresher q_new1/m2_new never
    # enter. mod_b is represented by its STALEST query (m2_old), not
    # its first-registered (m2_new).
    assert win == ["matmul", "q_old1", "m2_old", "q_old2"]
    assert "m2_new" not in win and "q_new1" not in win


def test_touched_queries_reverify_next_window(monkeypatch):
    """r8 TOUCHED mechanism: a query whose code changed since its
    latest green row must re-enter the very next window — its old
    evidence certifies superseded code. green_by_round reports
    touched names at age 0 (stalest possible), so they win the fill
    ahead of every genuinely-green query."""
    registered = ["matmul", "fresh1", "fresh2", "touched_q", "fresh3"]
    modules = dict.fromkeys(registered, "mod_a")
    raw_ages = {n: 6 for n in registered}  # everything freshly green

    def fake_green(rounds):
        ages = dict(raw_ages)
        for n in rotate_window.TOUCHED:
            if n in ages:
                ages[n] = 0
        return ages

    monkeypatch.setattr(rotate_window, "TOUCHED", ("touched_q",))
    monkeypatch.setattr(rotate_window, "green_by_round", fake_green)
    monkeypatch.setattr(rotate_window, "WINDOW", 2)
    win, deferred = rotate_window.propose_window(registered, modules, [6])
    assert deferred == []
    assert win == ["matmul", "touched_q"]


# Staleness bound derived from the live registry size (VERDICT r10 #2:
# the hardcoded 5 was ceil(235/50) and would redden at 251 queries at
# any rotation policy). Single source of truth: rotate_window.max_staleness.
MAX_STALENESS = rotate_window.max_staleness(len(registry.canonical_queries()))


def test_rotation_bounds_evidence_age(monkeypatch):
    """VERDICT r7 #4: with a ~220-query registry and a 50-query driver
    window, a green row can silently age. This simulates 12 future
    rotations (each committed window assumed fully green at its round)
    starting from the ACTUAL committed evidence, and asserts no
    green query's evidence age ever exceeds MAX_STALENESS rounds —
    i.e. the stalest-first fill policy really cycles the whole
    registry on a bounded cadence, with module anchors and the matmul
    pin included. Never-green queries are the drain test's job."""
    q = registry.canonical_queries()
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    # Seed from RAW recorded evidence: green_by_round's TOUCHED
    # fake-age-0 is a scheduling priority, not history, and must not
    # read as "12 rounds stale" inside the simulation.
    last_green = _raw_latest_green(list(window.CONSUMED_ROUNDS))
    cur = max(window.CONSUMED_ROUNDS)
    win = list(window.PRIORITY_PREFIX)  # the committed next window
    for step in range(1, 13):
        rnd = cur + step
        for n in win:
            last_green[n] = rnd
        # Let the backlog drain before enforcing the bound (a freshly
        # registered query's first rows come via the drain horizon).
        if set(q) <= set(last_green):
            stale = {n: rnd - last_green[n] for n in q
                     if rnd - last_green[n] > MAX_STALENESS}
            assert not stale, f"round {rnd}: evidence older than {MAX_STALENESS}: {stale}"
        monkeypatch.setattr(
            rotate_window, "green_by_round", lambda rounds, lg=dict(last_green): lg
        )
        win, _ = rotate_window.propose_window(list(q), modules, [rnd])
    assert set(q) <= set(last_green), "simulation never drained the backlog"


def test_committed_window_is_oldest_evidence_first():
    """The committed window's fill slots must be drawn from the
    stalest evidence: no green query OUTSIDE the window may be strictly
    older than the YOUNGEST non-anchor green inside it (module anchors
    and the matmul pin may be fresher by design)."""
    q = registry.canonical_queries()
    last_green = rotate_window.green_by_round(list(window.CONSUMED_ROUNDS))
    if set(q) - set(last_green):
        return  # backlog not drained — age rotation not in effect
    in_window = set(window.PRIORITY_PREFIX)
    # Identify module-anchor slots: the stalest query of each module.
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    reg_rank = {n: i for i, n in enumerate(q)}
    age_key = lambda n: (last_green[n], reg_rank[n])  # noqa: E731
    anchors = {"matmul"}
    by_mod: dict[str, list[str]] = {}
    for n in q:
        by_mod.setdefault(modules[n], []).append(n)
    for mod, names in by_mod.items():
        anchors.add(min(names, key=age_key))
    fill_in = [n for n in window.PRIORITY_PREFIX if n not in anchors]
    outside = [n for n in q if n not in in_window]
    if not fill_in or not outside:
        return
    youngest_in = max(age_key(n) for n in fill_in)
    oldest_out = min(age_key(n) for n in outside)
    assert oldest_out > youngest_in, (
        "a staler green query was left outside the window: "
        f"oldest_out={oldest_out} vs youngest_in={youngest_in}"
    )


def _raw_latest_green(rounds, repo=None):
    """query -> latest round with a recorded rows+schema green row,
    read straight from the CORRECTNESS files (no TOUCHED adjustment)."""
    import json

    repo = Path(repo) if repo is not None else REPO
    raw: dict[str, int] = {}
    for rnd in rounds:
        d = json.loads((repo / f"CORRECTNESS_r{rnd:02d}.json").read_text())
        for name, row in d.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
            ):
                raw[name] = max(raw.get(name, 0), rnd)
    return raw


def test_recorded_history_stays_within_staleness_bound():
    """VERDICT r8 #5 + r9 #2: the ACTUAL committed CORRECTNESS history
    must show no green query whose latest green row is more than
    MAX_STALENESS rounds behind the newest recorded round, and every
    query sitting exactly AT the bound must be scheduled in the window
    REGENERATED from all evidence on disk (else the next round pushes
    it past the bound).

    r9 sequencing race, fixed structurally: the r9 version asserted
    at-bound ⊆ the COMMITTED window, which reddened the moment the
    driver dropped a new CORRECTNESS file that the committed rotation
    (by definition) had not consumed. The contract now checks the
    rotation POLICY against the full on-disk history — it holds at
    every tree state; the committed-tuple equality remains a separate
    test (test_window_matches_evidence) keyed to CONSUMED_ROUNDS."""
    rounds = rotate_window.correctness_rounds()
    raw = _raw_latest_green(rounds)
    latest = max(rounds)
    over = {n: latest - r for n, r in raw.items() if latest - r > MAX_STALENESS}
    assert not over, f"recorded evidence older than {MAX_STALENESS} rounds: {over}"
    at_bound = [n for n, r in raw.items() if latest - r == MAX_STALENESS]
    q = registry.canonical_queries()
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    regen, _ = rotate_window.propose_window(list(q), modules, rounds)
    missed = [n for n in at_bound if n not in regen]
    assert not missed, (
        "queries at the staleness bound missing from the regenerated "
        f"window — run scripts/rotate_window.py: {missed}"
    )


def test_future_correctness_file_cannot_redden_suite(tmp_path, monkeypatch):
    """VERDICT r9 #2 + r10 #1 'done' criterion: drop a HYPOTHETICAL
    next-round CORRECTNESS fixture on top of the real history and
    re-run the staleness contract against the regenerated window — it
    must still hold, proving the contract is a property of the rotation
    POLICY, not of commit sequencing.

    r10 defect, fixed structurally: the r10 version greened the
    COMMITTED window.PRIORITY_PREFIX, which races the driver — the
    moment a new CORRECTNESS file lands that the committed rotation has
    not consumed, the committed window is one rotation behind and the
    simulation reddens (27 at-bound queries in the r10 judge run). The
    round protocol is "rotate consuming the new file as the round's
    first act", so the faithful simulation of the next round greens the
    window PROPOSED by the policy over ALL files on disk — which is
    what the driver would actually verify."""
    import json
    import shutil

    rounds = rotate_window.correctness_rounds()
    nxt = max(rounds) + 1
    q = registry.canonical_queries()
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    # The window the protocol would hand the driver for round `nxt`:
    # rotated from every CORRECTNESS file on disk (NOT the committed
    # PRIORITY_PREFIX, which may predate the newest file).
    policy_win, _ = rotate_window.propose_window(list(q), modules, rounds)
    for rnd in rounds:
        shutil.copy(
            REPO / f"CORRECTNESS_r{rnd:02d}.json",
            tmp_path / f"CORRECTNESS_r{rnd:02d}.json",
        )
    green_row = {"rows_match": True, "schema_match": True, "hash_match": True}
    (tmp_path / f"CORRECTNESS_r{nxt:02d}.json").write_text(
        json.dumps({n: green_row for n in policy_win})
    )
    monkeypatch.setattr(rotate_window, "REPO", str(tmp_path))
    sim_rounds = rotate_window.correctness_rounds()
    assert sim_rounds == rounds + [nxt]
    # RAW recorded ages for the bound itself — the TOUCHED device
    # reports age 0 (a scheduling priority, not history) and must not
    # read as "past the bound".
    ages = _raw_latest_green(sim_rounds, repo=tmp_path)
    at_bound = [n for n, r in ages.items() if nxt - r == MAX_STALENESS]
    over = [n for n, r in ages.items() if nxt - r > MAX_STALENESS]
    assert not over, f"hypothetical round already past bound: {over}"
    regen, _ = rotate_window.propose_window(list(q), modules, sim_rounds)
    missed = [n for n in at_bound if n not in regen]
    assert not missed, (
        f"rotation policy would let these age past the bound: {missed}"
    )


def test_staleness_bound_satisfiable_with_registry_growth(monkeypatch):
    """VERDICT r10 #2 'done' criterion: the invariant must stay
    satisfiable with +25 hypothetical queries. The bound derives from
    the registry size (max_staleness), so growth relaxes it instead of
    reddening it; this simulates rotations over the GROWN registry from
    the actual committed evidence and asserts the policy really cycles
    everything within the derived bound once the backlog drains."""
    q = registry.canonical_queries()
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    registered = list(q)
    for i in range(25):
        name = f"hypothetical_growth_q{i:02d}"
        registered.append(name)
        modules[name] = next(iter(modules.values()))
    bound = rotate_window.max_staleness(len(registered))
    assert bound >= MAX_STALENESS, "growth must never tighten the bound"
    # RAW recorded evidence, not the TOUCHED fake-age-0 device (see
    # test_rotation_bounds_evidence_age).
    last_green = dict(_raw_latest_green(list(window.CONSUMED_ROUNDS)))
    cur = max(window.CONSUMED_ROUNDS)
    win = list(window.PRIORITY_PREFIX)
    drained = False
    for step in range(1, 2 * bound + 13):
        rnd = cur + step
        for n in win:
            last_green[n] = rnd
        if set(registered) <= set(last_green):
            drained = True
            stale = {n: rnd - last_green[n] for n in registered
                     if rnd - last_green[n] > bound}
            assert not stale, f"round {rnd}: evidence older than {bound}: {stale}"
        monkeypatch.setattr(
            rotate_window, "green_by_round", lambda rounds, lg=dict(last_green): lg
        )
        win, _ = rotate_window.propose_window(registered, modules, [rnd])
    assert drained, "simulation never drained the grown backlog"


def test_never_green_floor_bounds_wait(monkeypatch):
    """VERDICT r11 #2 'done' criterion: a two-wave registration growth
    (+25 hypothetical queries over two consecutive rotations) must
    never leave a query un-driver-verified for more than 2 rotations
    after its registration, even under maximal must-go pressure. The
    NEVER_GREEN_FLOOR tier reserves min(#never-green, 8) entries per
    window ranked registration-order, ahead of every re-verification
    tier — so at r11's 8-9 query/round pace a wave first-verifies the
    very next rotation, and a double wave within two."""
    q = registry.canonical_queries()
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    registered = list(q)
    any_mod = next(iter(modules.values()))
    # Seed: RAW recorded evidence (TOUCHED fake-age-0 is a scheduling
    # priority, not history) — maximal realistic must-go pressure.
    last_green = dict(_raw_latest_green(list(window.CONSUMED_ROUNDS)))
    cur = max(window.CONSUMED_ROUNDS)
    registered_at: dict[str, int] = {}
    win = list(window.PRIORITY_PREFIX)
    waves = {1: 13, 2: 12}  # two consecutive waves, 25 total
    for step in range(1, 9):
        rnd = cur + step
        for n in win:
            last_green[n] = rnd
        overdue = {
            n: rnd - registered_at[n]
            for n in registered_at
            if n not in last_green and rnd - registered_at[n] > 2
        }
        assert not overdue, (
            f"round {rnd}: queries unverified >2 rotations after "
            f"registration: {overdue}"
        )
        for i in range(waves.get(step, 0)):
            name = f"hypothetical_wave{step}_q{i:02d}"
            registered.append(name)
            modules[name] = any_mod
            registered_at[name] = rnd
        monkeypatch.setattr(
            rotate_window, "green_by_round", lambda rounds, lg=dict(last_green): lg
        )
        win, _ = rotate_window.propose_window(registered, modules, [rnd])
    assert set(registered_at) <= set(last_green), "waves never drained"
