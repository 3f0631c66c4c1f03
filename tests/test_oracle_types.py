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


def test_dec2dbl_correctly_rounded(duck):
    """The sf1 sweep found DuckDB's direct CAST(decimal AS DOUBLE)
    double-rounding once the scaled significand exceeds 2^53 (int128 →
    double, then ×10^-scale — two roundings): pricing_summary's charge
    sum came back one ulp off Spark's correctly-rounded
    BigDecimal.doubleValue. sql_dec2dbl routes through VARCHAR (one
    correctly-rounded strtod); pin that it matches Python's correctly
    rounded float() on the exact divergent value from the probe."""
    from matrix_multiplication_map_reduce_gcp_spark.functions.exact import sql_dec2dbl

    val = "27864155010.941590"  # 2.79e16 scaled units at scale 6 > 2^53
    got = duck.sql(
        f"SELECT {sql_dec2dbl(f'CAST({val} AS DECIMAL(38,6))')} AS v"
    ).fetchone()[0]
    assert got == float(val)


def test_oracles_never_direct_cast_decimal_sums_to_double():
    """Static gate for the whole registry: every CAST(SUM(...) AS
    DOUBLE) in an oracle must go through the VARCHAR round-trip
    (sql_dec2dbl) — a direct cast reintroduces the double-rounding
    divergence at 10x+ scale even though sf0.01/sf0.1 stay green."""
    import re

    offenders = []
    for name, qd in registry.load_all().items():
        if not qd.oracle:
            continue
        text = qd.oracle
        for m in re.finditer(r"CAST\(SUM\(", text):
            depth, k = 0, m.start() + 4
            while k < len(text):
                if text[k] == "(":
                    depth += 1
                elif text[k] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            inner = text[m.start() + 5 : k]
            if re.search(r"\s+AS\s+DOUBLE\s*$", inner):
                offenders.append(name)
                break
    assert not offenders, (
        f"oracles direct-casting SUM to DOUBLE (use sql_dec2dbl / the "
        f"CAST(... AS STRING) round-trip): {sorted(set(offenders))}"
    )


def _decimal_sum_aliases(text):
    """Alias names bound to decimal SUM expressions in an oracle —
    `SUM(...DECIMAL...) [OVER (...)] AS name`, balanced-paren matched."""
    import re

    aliases = set()
    for m in re.finditer(r"SUM\(", text):
        depth, k = 0, m.end() - 1
        while k < len(text):
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if "DECIMAL" not in text[m.end() : k]:
            continue
        tail = text[k + 1 :]
        m2 = re.match(r"\s*(?:OVER\s*(?:\w+|\([^)]*\)))?\s*AS\s+(\w+)", tail)
        if m2:
            aliases.add(m2.group(1))
    return aliases


def test_oracles_never_direct_cast_decimal_alias_to_double():
    """The alias form of the same divergence: a CTE binds
    `SUM(...DECIMAL...) AS rev_dec` and a later select writes
    `CAST(rev_dec AS DOUBLE)` — semantically the identical direct
    decimal->double conversion the SUM gate forbids, just renamed
    (exactly the form hand-fixed in orders_yoy_growth /
    customer_rfm_segments / sql_cte_window_share this round). LAG/
    LEAD-wrapped uses count too."""
    import re

    offenders = []
    for name, qd in registry.load_all().items():
        if not qd.oracle:
            continue
        for alias in _decimal_sum_aliases(qd.oracle):
            pat = (
                rf"CAST\(\s*(?:(?:LAG|LEAD|SUM|MIN|MAX)\(\s*)?(?:\w+\.)?"
                rf"{alias}\s*(?:\)\s*(?:OVER\s*(?:\w+|\([^)]*\)))?)?"
                rf"\s*AS\s+DOUBLE\s*\)"
            )
            if re.search(pat, qd.oracle):
                offenders.append((name, alias))
    assert not offenders, (
        f"oracles direct-casting a decimal-SUM alias to DOUBLE (route "
        f"through CAST(... AS STRING) / sql_dec2dbl): {sorted(offenders)}"
    )
