"""The master differential gate: every registered query with an oracle
runs on Spark AND DuckDB at sf0.01 — the DRIVER'S gate scale — and must
match exactly. A green run here predicts a green driver round; sf0.001
is too small to expose order-dependent float bugs."""

from __future__ import annotations

import pytest

from matrix_multiplication_map_reduce_gcp_spark import registry

from .conftest import SF_CORRECTNESS, assert_matches_oracle

QUERIES = registry.load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    qd = QUERIES[name]
    df = qd.fn(spark, SF_CORRECTNESS)
    if qd.oracle is None:
        # rows-only check (mirrors the driver's weaker gate)
        assert df.count() >= 0
        return
    assert_matches_oracle(df, qd.oracle, duck)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"i", "j", "v"}


def test_every_query_name_has_callable():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 1
