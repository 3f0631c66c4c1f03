"""Oracle OUTPUT-TYPE portability gate.

Round-1 driver evidence: the only hash-failing checked query
(`user_sessions`) was also the only checked query whose DuckDB oracle
emitted a HUGEINT column (DuckDB's integer SUM widens to HUGEINT;
Spark's stays bigint) — the driver's value canonicalization does not
treat the two as equal even when every cell is numerically identical.
The local row-compare can't see this (Python fetch turns both into
`int`), so this gate pins it at the TYPE level: every oracle must
resolve to engine-portable scalar types only.

Nested types (LIST/STRUCT/MAP) are banned from oracle outputs for the
same reason — cell canonicalization of containers is engine-specific.
Project container contents to scalars (csv via string_agg, exploded
rows, ...) before the result leaves the operator.
"""

from __future__ import annotations

import pytest

from matrix_multiplication_map_reduce_gcp_spark import registry

# Types whose driver-side canonicalization is proven identical between
# a Spark collect and a DuckDB fetch. Extend ONLY with evidence.
PORTABLE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
            "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"}


@pytest.mark.parametrize(
    "name",
    sorted(n for n, qd in registry.load_all().items() if qd.oracle is not None),
)
def test_oracle_output_types_portable(name, duck):
    qd = registry.load_all()[name]
    rel = duck.sql(qd.oracle)
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in PORTABLE
    ]
    assert not bad, (
        f"{name}: non-portable oracle output types {bad} — cast to BIGINT/"
        f"DOUBLE/VARCHAR/TIMESTAMP in the oracle SQL (HUGEINT and nested "
        f"types hash-mismatch the driver gate even when values agree)"
    )
