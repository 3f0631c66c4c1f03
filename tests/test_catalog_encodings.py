"""Regression: the events loader must work under BOTH physical ts
encodings the fixtures have shipped with (round-2 lesson — the loader
assumed nanos-as-long and broke when the driver regenerated the
fixtures as timestamp[us], killing 9 driver rows, ~63 tests, and the
whole bench).

We write the same logical events data twice — once as TIMESTAMP(NANOS)
(read by Spark as BIGINT under nanosAsLong) and once as timestamp[us]
(read natively as TIMESTAMP_NTZ) — and require load_table to produce
identical TIMESTAMP values from each.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table

ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0, 123456), 10, "view", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 0, 1, 999999), 10, "click", 2.5, "{}"),
    (3, datetime.datetime(2024, 6, 30, 23, 59, 59, 1), 11, "purchase", 9.0, "{}"),
]


def _write_events(path: str, ts_unit: str) -> None:
    ts = pa.array([r[1] for r in ROWS], type=pa.timestamp(ts_unit))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([r[2] for r in ROWS], type=pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS]),
            "value": pa.array([r[4] for r in ROWS], type=pa.float64()),
            "props": pa.array([r[5] for r in ROWS]),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize("ts_unit", ["ns", "us"])
def test_events_loader_handles_both_encodings(spark, tmp_path, ts_unit):
    sf_dir = tmp_path / ts_unit
    sf_dir.mkdir()
    _write_events(str(sf_dir / "events.parquet"), ts_unit)

    df = load_table(spark, str(sf_dir), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)

    got = sorted((r.event_id, r.ts.replace(tzinfo=None)) for r in df.collect())
    want = sorted((r[0], r[1]) for r in ROWS)
    assert got == want


def test_both_encodings_agree(spark, tmp_path):
    dirs = {}
    for unit in ("ns", "us"):
        d = tmp_path / f"agree_{unit}"
        d.mkdir()
        _write_events(str(d / "events.parquet"), unit)
        dirs[unit] = str(d)
    a = load_table(spark, dirs["ns"], "events").collect()
    b = load_table(spark, dirs["us"], "events").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.mark.parametrize("ts_unit", ["ns", "us"])
def test_sessions_query_differential_under_both_encodings(spark, tmp_path, ts_unit):
    """End-to-end closure of the round-1/round-2 ts-encoding failure
    class: an events QUERY (30-min session windows, raw ts in the
    output) must hash-match its DuckDB oracle whichever physical
    encoding the fixture ships with — Spark truncates ns→µs at load,
    the oracle's CAST(ts AS TIMESTAMP) truncates identically, and on
    µs data both are no-ops."""
    import duckdb

    from matrix_multiplication_map_reduce_gcp_spark import registry

    from .conftest import assert_matches_oracle

    sf_dir = tmp_path / f"q_{ts_unit}"
    sf_dir.mkdir()
    _write_events(str(sf_dir / "events.parquet"), ts_unit)

    qd = registry.load_all()["batch_session_window"]
    df = qd.fn(spark, str(sf_dir))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    assert_matches_oracle(df, qd.oracle, con)
