"""Shared text primitives (Spark side + DuckDB SQL mirrors).

All expressions are JVM built-ins (split / transform / slice /
explode) — no Python in the row path, so they stay inside whole-stage
codegen at 100 TB. The SQL mirrors produce the identical values in
DuckDB for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (the fixture corpus is single-spaced)."""
    return F.split(col, " ")


def shingles(n: int = 3, col: str = "text") -> Column:
    """Word n-gram shingles as an array column (JVM-side transform+slice)."""
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so short
    # docs need an explicit empty-array branch.
    return F.expr(
        f"CASE WHEN size(split({col},' ')) < {n} THEN array()"
        f" ELSE transform(sequence(1, size(split({col},' ')) - {n - 1}),"
        f" i -> concat_ws(' ', slice(split({col},' '), i, {n}))) END"
    )


def shingle_rows(docs: DataFrame, n: int = 3, distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) rows; distinct per doc for set semantics."""
    out = docs.select("doc_id", F.explode(shingles(n)).alias("shingle"))
    return out.distinct() if distinct else out


# ---- DuckDB SQL mirrors ---------------------------------------------------

def sql_shingle_rows(n: int = 3, distinct: bool = True) -> str:
    """CTE body producing (doc_id, shingle) from `documents` in DuckDB."""
    concat = " || ' ' || ".join(f"t[i+{k}]" for k in range(n))
    d = "DISTINCT " if distinct else ""
    return f"""
    SELECT {d}doc_id, {concat} AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - {n - 2}, 1))) AS r(i)
    """


def sql_token_rows(distinct: bool = False) -> str:
    d = "DISTINCT " if distinct else ""
    return f"SELECT {d}doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents"
