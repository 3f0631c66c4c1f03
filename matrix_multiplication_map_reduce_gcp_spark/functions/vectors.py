"""Vector expressions over array<float|double> embedding columns.

Dot products use zip_with + a sequential left-fold aggregate: the
summation order is the array order in BOTH Spark and DuckDB
(list_dot_product), so results are bit-identical across engines —
no nondeterministic double reduction. All JVM-side; the Pandas-UDF
path is only for the batched brute-force kernel in similarity/.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded for cross-engine comparison and threshold
    stability (fold order matches, but rounding removes any residual
    libm/ulp exposure in sqrt-divide chains)."""
    return F.round(cosine(a, b), digits)


# ---- DuckDB SQL mirrors ---------------------------------------------------

def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"({sql_dot(a, b)} / "
        f"(sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
    )


def sql_cosine_rounded(a: str, b: str, digits: int = 6) -> str:
    return f"ROUND({sql_cosine(a, b)}, {digits})"
