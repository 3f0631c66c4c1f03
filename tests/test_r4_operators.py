"""Constructed-input edge-case pins for the round-4 operators: bin
boundaries of the interval-overlap join, at-or-after inclusivity of
the forward as-of, multiset set-op multiplicity, the weighted-median
boundary row, market-basket lift arithmetic, strong-tie graph
sparsification, CDC diff classification, and an independent Python
replica of the Efraimidis–Spirakis weighted sampler. The registry
oracle suite proves engine parity on the fixtures; these tests pin the
SEMANTICS on inputs chosen to sit exactly on the decision boundaries.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq

from matrix_multiplication_map_reduce_gcp_spark import registry

QS = registry.load_all()

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)  # exactly on a 10-min bin edge


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}" for _ in rows]),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/events.parquet")


def _write_lineitem_pairs(tmp_path, rows):
    """rows: (l_orderkey, l_partkey) — minimal columns the basket and
    set-op queries touch."""
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/lineitem.parquet")


def test_incident_window_boundaries(spark, tmp_path):
    """[ts, ts+10min) must be inclusive-exclusive even when the error
    lands EXACTLY on a bin edge (the single-bin expansion case), and a
    zero-impact error must still emit a row."""
    us = datetime.timedelta(microseconds=1)
    rows = [
        (1, T0, 1, "error", 0.0),
        (2, T0, 2, "view", 0.0),                               # inclusive start
        (3, T0 + datetime.timedelta(minutes=10) - us, 3, "click", 0.0),  # last inside
        (4, T0 + datetime.timedelta(minutes=10), 4, "view", 0.0),        # excluded end
        (5, T0 - us, 5, "click", 0.0),                          # before start
        (6, T0 + datetime.timedelta(hours=5), 6, "error", 0.0),  # zero impact
        # error mid-bin: window spans two bins; candidate in 2nd bin
        (7, T0 + datetime.timedelta(hours=1, minutes=5), 7, "error", 0.0),
        (8, T0 + datetime.timedelta(hours=1, minutes=14), 8, "view", 0.0),
    ]
    _write_events(tmp_path, rows)
    got = {
        r.error_id: (r.n_impacted, r.n_users)
        for r in QS["incident_impact_events"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 2), 6: (0, 0), 7: (1, 1)}


def test_forward_asof_equal_ts_inclusive(spark, tmp_path):
    """at-or-after: a purchase at the SAME microsecond as the click
    matches with wait 0; a click after the last purchase gets nulls."""
    rows = [
        (1, T0, 1, "click", 0.0),
        (2, T0, 1, "purchase", 0.0),  # same instant — must match
        (3, T0 + datetime.timedelta(minutes=1), 1, "click", 0.0),
        (4, T0 + datetime.timedelta(minutes=2), 1, "purchase", 0.0),
        (5, T0 + datetime.timedelta(minutes=3), 1, "click", 0.0),  # no next
    ]
    _write_events(tmp_path, rows)
    got = {
        r.click_id: (r.purchase_id, r.wait_us)
        for r in QS["asof_forward_click_to_purchase"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {1: (2, 0), 3: (4, 60_000_000), 5: (None, None)}


def test_except_intersect_all_multiplicity(spark, tmp_path):
    """Multiset semantics: surplus and min multiplicities, not
    existence."""
    flags = {"R": [1, 1, 1, 2], "A": [1, 2, 2], "N": [1]}
    rows, ok = [], 0
    for flag, parts in flags.items():
        for p in parts:
            ok += 1
            rows.append((ok, p, flag))
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_returnflag": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/lineitem.parquet")
    exc = {
        r.l_partkey: r.n
        for r in QS["except_all_returned_parts"].fn(spark, str(tmp_path)).collect()
    }
    ins = {
        r.l_partkey: r.n
        for r in QS["intersect_all_returned_parts"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert exc == {1: 2}  # 3 R minus 1 A; part 2: 1 R - 2 A → gone
    assert ins == {1: 1, 2: 1}  # min(3,1)=1, min(1,2)=1


def test_weighted_median_boundary_row(spark, tmp_path):
    """The chosen value is the SMALLEST price whose cumulative weight
    reaches half the total — cum=1 of 4 must not qualify, cum=3 must."""
    rows = [  # (price, qty): weights 1,2,1 → total 4, median at 20
        (1, "R", 10.0, 1.0),
        (2, "R", 20.0, 1.0),
        (3, "R", 20.0, 1.0),
        (4, "R", 30.0, 1.0),
    ]
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_returnflag": pa.array([r[1] for r in rows]),
            "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
            "l_quantity": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/lineitem.parquet")
    got = {
        r.l_returnflag: r.weighted_median_price
        for r in QS["weighted_median_price"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {"R": 20.0}


def test_market_basket_lift_arithmetic(spark, tmp_path):
    """Planted baskets: 35 orders {1,2} makes the pair frequent; 40
    singleton orders {3} make part 3 frequent but pair-less. Lift must
    equal pair*N/(cnt1*cnt2) rounded to 6."""
    rows = []
    for o in range(35):
        rows += [(o, 1), (o, 2)]
    for o in range(100, 140):
        rows.append((o, 3))
    _write_lineitem_pairs(tmp_path, rows)
    got = [
        (r.part_a, r.part_b, r.pair_orders, r.lift)
        for r in QS["market_basket_pairs"].fn(spark, str(tmp_path)).collect()
    ]
    want_lift = round(35 * 75 / (35 * 35), 6)
    assert got == [(1, 2, 35, want_lift)]


def test_two_hop_strong_tie_sparsification(spark, tmp_path):
    """1–2 share 5 orders (strong), 2–3 share only 1 (weak): supplier
    3 must NOT be reachable. Strengthening 2–3 to 5 shared orders
    opens the 2-hop path 1→2→3."""

    def write(weak23):
        rows = []
        for o in range(5):
            rows += [(o, 11, 1), (o, 12, 2)]
        co23 = 1 if weak23 else 5
        for o in range(100, 100 + co23):
            rows += [(o, 13, 2), (o, 14, 3)]
        tbl = pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, f"{tmp_path}/lineitem.parquet")

    write(weak23=True)
    got = {
        r.suppkey: r.n_reach
        for r in QS["supplier_two_hop_reach"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 1, 2: 1}  # 3 invisible through the weak edge

    write(weak23=False)
    got = {
        r.suppkey: r.n_reach
        for r in QS["supplier_two_hop_reach"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}  # 1↔2↔3: two-hop closes the ends


def _hash_coin(key, mod):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % mod


def test_snapshot_diff_matches_python_replica(spark):
    """Classification counts vs an independent hashlib replica of the
    coin + fingerprint logic on the sf0.001 fixture."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderstatus, o_custkey, o_orderpriority "
        f"FROM '{sf}/orders.parquet'"
    ).fetchall()
    want = {"inserted": 0, "deleted": 0, "changed": 0, "unchanged": 0}
    for k, status, cust, prio in rows:
        coin = _hash_coin(k, 20)
        in_y, in_t = coin != 1, coin != 2
        if in_y and not in_t:
            want["deleted"] += 1
        elif in_t and not in_y:
            want["inserted"] += 1
        elif in_y and in_t:
            want["changed" if coin == 0 else "unchanged"] += 1
    want = {k: v for k, v in want.items() if v}
    got = {
        r.change_type: r.n
        for r in QS["snapshot_diff_orders"].fn(spark, sf).collect()
    }
    assert got == want


def test_weighted_sample_matches_python_replica(spark):
    """The selected sample equals a pure-Python Efraimidis–Spirakis
    replica (same md5-derived uniforms, same keys) on sf0.001 — and a
    second run returns the identical set (no RNG state anywhere)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT o_orderpriority, o_orderkey, o_totalprice "
        f"FROM '{sf}/orders.parquet'"
    ).fetchall()
    by_stratum: dict[str, list] = {}
    for prio, k, price in rows:
        u = (_hash_coin(k, 1 << 32) + 1) / 4294967296.0
        by_stratum.setdefault(prio, []).append((math.log(u) / price, -k, k))
    want = set()
    for prio, items in by_stratum.items():
        items.sort(reverse=True)  # key desc, then orderkey asc via -k
        for rnk, (_, _, k) in enumerate(items[:5], start=1):
            want.add((prio, k, rnk))
    fn = QS["weighted_sample_orders"].fn
    got = {
        (r.o_orderpriority, r.o_orderkey, r.rnk)
        for r in fn(spark, sf).collect()
    }
    assert got == want
    assert got == {
        (r.o_orderpriority, r.o_orderkey, r.rnk)
        for r in fn(spark, sf).collect()
    }


def test_event_pattern_counts_non_overlapping(spark, tmp_path):
    """v[^ep]*p: an intervening error kills the conversion; matches
    never overlap; ordering ties on ts break by event_id."""
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1: v c p v p  → 2 conversions
        (1, T0 + 0 * m, 1, "view", 0.0),
        (2, T0 + 1 * m, 1, "click", 0.0),
        (3, T0 + 2 * m, 1, "purchase", 0.0),
        (4, T0 + 3 * m, 1, "view", 0.0),
        (5, T0 + 4 * m, 1, "purchase", 0.0),
        # user 2: v e p → error breaks the pattern
        (6, T0 + 0 * m, 2, "view", 0.0),
        (7, T0 + 1 * m, 2, "error", 0.0),
        (8, T0 + 2 * m, 2, "purchase", 0.0),
        # user 3: same-ts v then p — event_id order decides (v first)
        (9, T0, 3, "view", 0.0),
        (10, T0, 3, "purchase", 0.0),
    ]
    _write_events(tmp_path, rows)
    got = {
        r.user_id: (r.journey, r.n_conversions)
        for r in QS["event_pattern_match"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: ("vcpvp", 2), 2: ("vep", 0), 3: ("vp", 1)}
