"""Mechanically rotate the driver's 50-query correctness window.

The driver verifies only the first ``WINDOW`` registry entries per
round, so which queries ever receive a driver-verified row is a
scheduling problem. Rounds 1-3 hand-picked the window from a comment
queue (registry.py r3) — one forgotten rotation would have stranded
the PQ stack unverified (VERDICT r3, "What's wrong" #3). This script
makes the rotation a pure function of the committed evidence:

    window = f(registry order, CORRECTNESS_r*.json history)

Algorithm (deterministic, no RNG, no timestamps):
 1. green(q) = some CORRECTNESS round shows rows+schema+hash all true.
 2. Every query module keeps >=1 representative in the window
    (tests/test_registry_meta.py pins this) — the rep is the module's
    first never-green query in registration order, else its
    first-registered query (a proven anchor).
 3. Remaining slots fill with never-green queries: judge-prioritized
    names first (PRIORITY_HINTS), then registration order. Once the
    never-green backlog is empty (steady state since r6), slots
    re-verify GREEN queries oldest-evidence-first — age = the latest
    round with a green row — so driver evidence rotates instead of
    pinning to the registry head (VERDICT r6 #4).
 4. The result is written to matrix_multiplication_map_reduce_gcp_spark/window.py
    together with CONSUMED_ROUNDS (the CORRECTNESS rounds the decision
    consumed) and DEFERRED (never-green queries that didn't fit).
    tests/test_registry_window.py re-runs this function on exactly
    CONSUMED_ROUNDS and asserts the committed window matches — so the
    window can never silently drift from the evidence, while newly
    landed CORRECTNESS files don't break the suite (they only change
    the output of the NEXT `python scripts/rotate_window.py` run).

Run after each round's CORRECTNESS_r{N}.json lands:
    python scripts/rotate_window.py && python scripts/dump_registry.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50

# Window entries reserved for FIRST verification of never-green
# queries (VERDICT r11 #2): a registration wave of W new queries is
# guaranteed driver rows within ceil(W / NEVER_GREEN_FLOOR) rotations
# regardless of must-go pressure. 8 ≈ the r10/r11 per-round
# registration pace, so a normal wave first-verifies the very next
# rotation.
NEVER_GREEN_FLOOR = 8

# Never-green queries the judge called out as highest-value: verified
# first when capacity is short. Order matters; unknown names are
# ignored (they fall out as rounds verify them).
# Queries whose IMPLEMENTATION changed since their latest green row:
# a green driver row certifies the code as of its round, so touching
# a query's code path supersedes its evidence. Names here are treated
# as stalest-possible (evidence age 0) by green_by_round, which both
# puts them at the head of the next window's re-verification fill and
# keeps every window test consistent with the committed rotation.
# Maintained by the builder in the same commit that touches the
# query; entries drain naturally (remove once re-verified green).
# r8: ann_recall_report's exact side gained an explicit F.broadcast
# (VERDICT r7 #3) — re-verified green in CORRECTNESS_r08, drained.
# r9: the five touched decode queries + cms_heavy_hitters — all six
# re-verified green in CORRECTNESS_r09, drained.
# r10: the three PNG-decoding queries (Adam7/_defilter rework) — all
# re-verified green in CORRECTNESS_r10, drained.
# r11: the triangle kernel gained volume-adaptive closure parallelism
# (VERDICT r10 #4, operators/pagerank.py::_triangle_top20) — both
# queries sharing it are superseded until a fresh green row lands.
# r11: the three entropy-rung blob generators gained encode-time
# corpus-contract asserts (ADVICE r10) — generation code paths
# changed, so their r10 evidence is superseded.
TOUCHED = (
    "triangle_count_suppliers",
    "triangle_count_sampled",
    "multimodal_deflate_decode",
    "multimodal_flac_decode",
    "multimodal_arith_decode",
)

PRIORITY_HINTS = (
    # Round-4 second-wave flagships: verify new capability the same
    # round it ships (the r3 lesson — the PQ stack shipped a round
    # before its first driver row).
    "dsir_importance_weights", "semdedup_keep_list",
    "label_propagation_communities", "stream_cdc_upsert_state",
    "attribution_last_touch", "quality_percentile_calibration",
    "equi_width_price_histogram", "join_view_ivm", "universe_sample_join",
    "shuffle_skew_report", "audio_vad_segments", "knn_graph_lsh",
    "embedding_prototypicality", "table_expectations_orders", "ann_recall_report", "stream_funnel_stages",
    "ann_pq_rerank_topk", "ann_ivfpq_topk", "pq_codes", "ann_pq_adc_topk",
    "stream_running_user_totals", "stream_sliding_counts",
    "stream_static_enrich", "sorted_neighborhood_pairs", "dedup_keep_list",
    "pit_feature_join", "lateral_top2_suppliers", "correlated_exists_orders",
    "bloom_join_prune", "multimodal_image_dup_groups",
    "weekly_retention_cohorts", "quality_filter_verdict", "duplicate_spans",
    "doc_chunking", "pii_scrub_accounting", "zorder_morton_keys",
    # Round-5 new capability, same-round-verify rule:
    "k_core_suppliers", "source_minhash_similarity", "epoch_shuffle_shards",
    "leakage_safe_split",
    # Round-11 flagships (same-round-verify rule). matmul_strassen
    # deferred from the r11 window (27 at-bound made 51 hard demands on
    # 50 slots); listed since r12 per VERDICT r11 #1 so the two
    # never-driver-green queries lead the fill ahead of any r12 wave.
    "multimodal_avc_intra", "bpe_train_merges", "zorder_layout_plan",
    "multimodal_mpeg_motion", "multimodal_psycho_audio",
    "multimodal_mdct_audio", "matmul_strassen", "stream_avc_ingest",
)


def max_staleness(n_registered: int) -> int:
    """Staleness bound in rounds for an ``n_registered``-query registry
    with a ``WINDOW``-slot driver window: the stalest-first fill policy
    cycles the whole registry every ceil(N / WINDOW) rotations, so no
    green row's evidence may be older than that many rounds
    (VERDICT r10 #2 — the bound must GROW with the registry instead of
    pinning a hardcoded 5 that reddens at 251 queries). Tests derive
    their bound from this single definition."""
    return -(-n_registered // WINDOW)


def correctness_rounds() -> list[int]:
    """Rounds with a committed CORRECTNESS_r{N}.json, ascending."""
    rounds = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append(int(m.group(1)))
    return sorted(rounds)


def green_by_round(rounds: list[int]) -> dict[str, int]:
    """Map query -> LATEST round with a fully-green driver row in
    ``rounds``. The round number is the query's evidence age: with the
    backlog drained (every query green at least once), rotation
    re-verifies the STALEST evidence first (VERDICT r6 #4) — code
    keeps evolving, so a green row from three rounds ago certifies
    three-rounds-ago code."""
    latest: dict[str, int] = {}
    for rnd in rounds:
        path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match") is not False  # rows-only ⇒ None
            ):
                latest[name] = max(latest.get(name, rnd), rnd)
    # Evidence interpretation, not history rewriting: a green row for
    # code that has since changed certifies the SUPERSEDED version, so
    # touched queries report the stalest possible age and win the next
    # window's re-verification slots.
    for name in TOUCHED:
        if name in latest:
            latest[name] = 0
    return latest


def green_queries(rounds: list[int]) -> set[str]:
    """Queries with at least one fully-green driver row in ``rounds``."""
    return set(green_by_round(rounds))


def propose_window(
    registered: list[str],
    modules: dict[str, str],
    rounds: list[int],
    extra_green: tuple[str, ...] = (),
) -> tuple[list[str], list[str]]:
    """Return (window, deferred_never_green) for the given evidence.

    ``extra_green`` lets callers simulate a FUTURE rotation: names
    treated as already driver-verified on top of the recorded rounds
    (tests use it to prove the deferred backlog drains next round);
    they count as freshest-possible evidence (just verified)."""
    last_green = green_by_round(rounds)
    fresh = (max(rounds) if rounds else 0) + 1
    for n in extra_green:
        last_green[n] = fresh
    green = set(last_green)
    never_green = [n for n in registered if n not in green]

    # Module representatives: the rep is the module's first never-green
    # query, so the anchor slot itself buys new verification coverage.
    # A FULLY-GREEN module gets no rep while a never-green backlog is
    # waiting (r4 judge: 10 fully-green anchors capped the r5 window at
    # 39 first-ever rows; the backlog outranks re-verification). Once
    # the backlog fits, fully-green modules regain their anchors and
    # spare slots re-verify greens in registration order — the steady
    # state is again "every module represented, window full".
    mod_order: list[str] = []
    by_mod: dict[str, list[str]] = {}
    for name in registered:
        mod = modules[name]
        if mod not in by_mod:
            mod_order.append(mod)
            by_mod[mod] = []
        by_mod[mod].append(name)

    window: list[str] = []
    # The flagship stays pinned first: entry() runs it, bench warms on
    # it, and every round re-confirms the engine's core join-agg path.
    if "matmul" in registered:
        window.append("matmul")
    for mod in mod_order:
        if any(modules[n] == mod for n in window):
            continue
        rep = next((n for n in by_mod[mod] if n in never_green), None)
        if rep is not None:
            window.append(rep)

    hint_rank = {n: i for i, n in enumerate(PRIORITY_HINTS)}
    reg_rank = {n: i for i, n in enumerate(registered)}
    latest = max(rounds) if rounds else 0
    bound = max_staleness(len(registered))

    # Never-green FLOOR (VERDICT r11 #2): at r11's registration pace a
    # heavy must-go wave could defer first-verifies indefinitely — the
    # r11 window deferred matmul_strassen and multimodal_mdct_audio
    # behind 27 at-bound re-verifications, leaving them the only two
    # queries with zero driver-green history. The floor RESERVES
    # min(#never-green, NEVER_GREEN_FLOOR) window entries for
    # never-green queries ahead of every re-verification tier
    # (including must-go), ranked registration-order so the
    # longest-waiting first-verify always wins. Module reps (above)
    # count toward the floor — they are never-green by construction
    # while a backlog exists. Must-go pressure is unaffected in
    # practice: the floor claims slots only while a backlog exists
    # (registration waves), and a wave of W new queries both grows the
    # registry (relaxing max_staleness) and drains within
    # ceil(W / NEVER_GREEN_FLOOR) rotations
    # (tests/test_registry_window.py::test_never_green_floor_bounds_wait).
    floor_target = min(len(never_green), NEVER_GREEN_FLOOR)
    for n in sorted(never_green, key=lambda n: reg_rank[n]):
        if sum(1 for w in window if w in never_green) >= floor_target:
            break
        if len(window) >= WINDOW:
            break
        if n not in window:
            window.append(n)

    def age_key(n):
        lg = last_green.get(n, -1)
        must = 0 if 0 < lg <= latest - bound else 1
        return (must, lg, reg_rank[n])

    # Demand tiers, hardest first (restructured in r11 wave 7, when 7
    # never-green + 27 at-bound + matmul + 16 fully-green module
    # anchors = 51 demands met 50 slots and the old fill order spent
    # slots on first-verifies and anchors, dropping an at-bound
    # query):
    #  1. HARD — the staleness bound: a query whose RECORDED evidence
    #     age reaches the bound must be scheduled THIS rotation. No
    #     overflow channel exists, so must-go names claim slots first.
    #  2. HARD while nothing defers — module anchors: every module
    #     keeps a representative, so their slots are RESERVED before
    #     the soft never-green fill spends them. (Modules with a
    #     never-green member are already covered by the rep loop
    #     above, so the reserved set is exactly the fully-green
    #     modules with no must-go member.)
    #  3. SOFT — first verification of never-green queries: fills the
    #     remaining room; the tail defers (DEFERRED leads the next
    #     rotation's fill, and the meta test waives fully-green
    #     anchors only in that recorded state — the drain-horizon
    #     test bounds how long a deferral can last).
    #  4. Pad — re-verify greens stalest-evidence-first (VERDICT r6
    #     #4); the age key's must-go tier keeps any bound-adjacent
    #     query ahead of the TOUCHED fake-age-0 preference.
    must_go = sorted(
        (
            n
            for n in registered
            if n not in window
            and 0 < last_green.get(n, -1) <= latest - bound
        ),
        key=age_key,
    )
    for n in must_go:
        if len(window) >= WINDOW:
            break
        window.append(n)

    uncovered = [
        mod
        for mod in mod_order
        if not any(modules[n] == mod for n in window)
    ]
    fill = sorted(
        (n for n in never_green if n not in window),
        key=lambda n: (hint_rank.get(n, len(PRIORITY_HINTS)), reg_rank[n]),
    )
    deferred: list[str] = []
    room = WINDOW - len(window) - len(uncovered)
    for n in fill:
        if room > 0:
            window.append(n)
            room -= 1
        else:
            deferred.append(n)
    for mod in uncovered:
        if len(window) >= WINDOW:
            break
        window.append(min(by_mod[mod], key=age_key))
    for n in sorted(registered, key=age_key):
        if len(window) >= WINDOW:
            break
        if n not in window:
            window.append(n)
    return window, deferred


def render(window: list[str], deferred: list[str], rounds: list[int]) -> str:
    def tup(items: list[str], indent: str) -> str:
        if not items:
            return "()"
        body = "\n".join(f'{indent}    "{n}",' for n in items)
        return f"(\n{body}\n{indent})"

    return f'''"""Driver correctness window — GENERATED by scripts/rotate_window.py.

Do not hand-edit: tests/test_registry_window.py regenerates the window
from CONSUMED_ROUNDS' CORRECTNESS files and asserts equality. To
rotate after a new round lands, run:

    python scripts/rotate_window.py && python scripts/dump_registry.py
"""

# CORRECTNESS rounds consumed by this rotation decision.
CONSUMED_ROUNDS = {tuple(rounds)!r}

# First {WINDOW} registry entries = the driver-verified window.
PRIORITY_PREFIX = {tup(window, "")}

# Never-green queries that did not fit this round's window; they lead
# the fill queue next rotation (minus whatever the hints pull ahead).
DEFERRED = {tup(deferred, "")}
'''


def main() -> None:
    from matrix_multiplication_map_reduce_gcp_spark import registry

    # canonical_queries (not load_all) so rotation works even when the
    # committed window references a renamed query, and so the order is
    # import-history-independent.
    q = registry.canonical_queries()
    registered = list(q)
    modules = {n: qd.fn.__module__ for n, qd in q.items()}
    rounds = correctness_rounds()
    window, deferred = propose_window(registered, modules, rounds)
    out = os.path.join(REPO, "matrix_multiplication_map_reduce_gcp_spark", "window.py")
    with open(out, "w") as f:
        f.write(render(window, deferred, rounds))
    print(
        f"wrote window.py: {len(window)} in window "
        f"({sum(1 for n in window if n not in green_queries(rounds))} never-green), "
        f"{len(deferred)} deferred, consumed rounds {rounds}"
    )


if __name__ == "__main__":
    main()
