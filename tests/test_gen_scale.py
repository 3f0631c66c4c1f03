"""Pins for scripts/gen_scale.py (the synthetic scale-factor probe
generator behind BENCH_SF1_r04.json): replication must preserve
schemas and join topology or the scaling measurements mean nothing.
DuckDB-only — no Spark session needed."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.001"
FACTOR = 2


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfscale")
    subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "gen_scale.py"),
            "--src", SRC, "--out", str(out), "--factor", str(FACTOR),
        ],
        check=True,
        capture_output=True,
    )
    return out


ALL_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
DIMS = {"region", "nation"}


def test_row_counts_and_schemas(scaled):
    con = duckdb.connect()
    for t in ALL_TABLES:
        n_src = con.sql(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_out = con.sql(f"SELECT count(*) FROM '{scaled}/{t}.parquet'").fetchone()[0]
        expect = n_src if t in DIMS else n_src * FACTOR
        assert n_out == expect, f"{t}: {n_out} != {expect}"
        s_src = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        s_out = con.sql(f"DESCRIBE SELECT * FROM '{scaled}/{t}.parquet'").fetchall()
        assert [r[:2] for r in s_src] == [r[:2] for r in s_out], f"{t}: schema drift"


def test_keys_stay_unique(scaled):
    con = duckdb.connect()
    for t, key in (("customer", "c_custkey"), ("orders", "o_orderkey"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")):
        n, d = con.sql(
            f"SELECT count(*), count(DISTINCT {key}) FROM '{scaled}/{t}.parquet'"
        ).fetchone()
        assert n == d, f"{t}.{key}: replication collided keys"


def test_join_topology_preserved(scaled):
    """Every copy joins within itself: the orders⋈customer match count
    must scale exactly by FACTOR (a key-stride mismatch between the
    two tables would break this immediately)."""
    con = duckdb.connect()
    n_src = con.sql(
        f"SELECT count(*) FROM '{SRC}/orders.parquet' o "
        f"JOIN '{SRC}/customer.parquet' c ON o.o_custkey = c.c_custkey"
    ).fetchone()[0]
    n_out = con.sql(
        f"SELECT count(*) FROM '{scaled}/orders.parquet' o "
        f"JOIN '{scaled}/customer.parquet' c ON o.o_custkey = c.c_custkey"
    ).fetchone()[0]
    assert n_out == n_src * FACTOR
