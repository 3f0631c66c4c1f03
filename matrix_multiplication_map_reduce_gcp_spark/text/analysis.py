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


def shingles(n: int = 3, tokens_col: str = "__t") -> Column:
    """Word n-gram shingles from a PRE-SPLIT token-array column.

    Callers must project `split(text, ' ')` into a named column first:
    referencing `split(text)` inside the transform lambda re-evaluates
    the split per array element — O(tokens²) per document, which
    dominated the shingle pipeline's runtime at sf0.1 until hoisted.

    NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so short
    docs need the explicit empty-array branch."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) < {n} THEN array()"
        f" ELSE transform(sequence(1, size({tokens_col}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({tokens_col}, i, {n}))) END"
    )


def shingle_rows(
    docs: DataFrame, n: int = 3, distinct: bool = True, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, [keep_cols...,] shingle) rows; distinct per doc for set
    semantics. Blocking columns (lang/source/...) ride along through
    the explode for free — never join them back onto 10M shingle rows."""
    toks = docs.select("doc_id", *keep_cols, F.split("text", " ").alias("__t"))
    out = toks.select("doc_id", *keep_cols, F.explode(shingles(n)).alias("shingle"))
    return out.distinct() if distinct else out


# ---- DuckDB SQL mirrors ---------------------------------------------------

def sql_shingle_rows(
    n: int = 3, distinct: bool = True, keep_cols: tuple[str, ...] = ()
) -> str:
    """CTE body producing (doc_id, [keep_cols,] shingle) in DuckDB."""
    concat = " || ' ' || ".join(f"t[i+{k}]" for k in range(n))
    d = "DISTINCT " if distinct else ""
    keep = "".join(f"{c}, " for c in keep_cols)
    return f"""
    SELECT {d}doc_id, {keep}{concat} AS shingle
    FROM (SELECT doc_id, {keep}string_split(text, ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - {n - 2}, 1))) AS r(i)
    """


def sql_token_rows(distinct: bool = False) -> str:
    d = "DISTINCT " if distinct else ""
    return f"SELECT {d}doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents"
