"""Synthesize a larger scale factor by key-shifted replication.

The driver ships sf{0.001,0.01,0.1}; all committed perf evidence is
sf0.1 (VERDICT r3, "Next round" #8). This script manufactures an
sfN probe: FACTOR shifted copies of every fact table, with EVERY
bigint entity key offset by copy_i * STRIDE — one global stride, so
every intra-copy join relationship (orders↔customer, lineitem↔part,
events↔customer, …) is preserved exactly and keys never collide.
Dimension tables (region, nation) are not replicated.

This is a THROUGHPUT probe, not a correctness fixture: replicated
text/embeddings mean dedup/ANN queries see planted duplicate groups
of size FACTOR (realistic for a dedup workload, but not a natural
corpus). Use for BENCH_SF1-style scaling runs only.

    python scripts/gen_scale.py --out /tmp/bench_sf1/sf1.0 --factor 10
"""

from __future__ import annotations

import argparse
import os

import duckdb

STRIDE = 1_000_000_000  # > every key in any shipped SF

# table -> bigint key columns to shift per copy (everything else rides
# along unchanged; dims absent = copied once).
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{args.out}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied (dim)")
    for t, keys in SHIFT.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + t.i * {STRIDE} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{args.src}/{t}.parquet', "
            f"range({args.factor}) t(i)) "
            f"TO '{args.out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
