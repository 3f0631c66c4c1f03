"""Vector expressions over array<float|double> embedding columns.

Dot products use zip_with + a sequential left-fold aggregate: the
summation order is the array order in BOTH Spark and DuckDB
(list_dot_product), so results are bit-identical across engines —
no nondeterministic double reduction. :func:`cosine_arrow` is the
Arrow/NumPy kernel for hot verify paths — the same operation sequence
vectorized per batch, bit-identical to the fold (and so to the
oracle); everything else stays JVM-side.
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


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-batched NumPy cosine, bit-identical to :func:`cosine`.

    The fold path evaluates ~3·dim interpreted lambda calls per pair
    (zip_with + aggregate are not codegen'd as one fused loop); at
    sf1 the embedding near-dup verify measured ~0.3 ms/pair in folds.
    This kernel reproduces the EXACT same IEEE-754 operation sequence
    vectorized across the batch: elementwise products, then a
    sequential accumulation in array-index order (``((0+p0)+p1)+…`` —
    dim vectorized adds per batch), correctly-rounded sqrt and divide.
    Same ops, same order, same rounding ⇒ bit-identical doubles
    (pinned by tests/test_vectors_arrow.py against the fold on random
    and fixture vectors). Rounding stays OUT of this kernel: callers
    apply JVM-side F.round (:func:`cosine_rounded_arrow`) so the
    half-up semantics shared with the DuckDB oracle are untouched."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va, vb):
        import numpy as np
        import pandas as pd

        def kernel(xa, xb):
            A = np.array(xa.tolist(), dtype=np.float64)
            B = np.array(xb.tolist(), dtype=np.float64)

            def seqsum(P):
                acc = np.zeros(len(P), dtype=np.float64)
                for i in range(P.shape[1]):
                    acc = acc + P[:, i]
                return acc

            d = seqsum(A * B)
            na = np.sqrt(seqsum(A * A))
            nb = np.sqrt(seqsum(B * B))
            return d / (na * nb)

        if len(va) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        # Row-level NULL arrays arrive as None (the JVM wrapper below
        # also nulls ragged / null-element rows): compute on the valid
        # subset, emit real NULLs (not NaN — Spark orders NaN ABOVE
        # every number, so a NaN would pass >= threshold filters the
        # fold's NULL never did) for the rest.
        valid = (~(va.isna() | vb.isna())).to_numpy()
        if not valid.any():
            return pd.Series([None] * len(va), dtype=object)
        # A batch may legitimately mix embedding DIMENSIONS (model
        # migrations leave dim-64 and dim-32 rows in one column; the
        # JVM guard only pins size(a)==size(b) PER ROW). np.array on a
        # ragged list would raise, so vectorize per distinct length —
        # each length group is rectangular and the per-row IEEE op
        # sequence is unchanged, so results stay bit-identical to the
        # fold regardless of grouping.
        lengths = np.array([len(x) for x in va.iloc[valid]])
        out = pd.Series([None] * len(va), dtype=object)
        vidx = np.flatnonzero(valid)
        for dim in np.unique(lengths):
            sel = vidx[lengths == dim]
            out.iloc[sel] = kernel(va.iloc[sel], vb.iloc[sel])
        if (~valid).any():
            return out
        return out.astype(np.float64)

    # The fold returns NULL for a null array, a null element, or a
    # length mismatch (zip_with pads with null -> product null -> sum
    # null). Mirror that contract JVM-side by nulling such inputs
    # BEFORE they reach the kernel — the codegen'd exists/size scan is
    # cheap; the kernel handles the remaining (legitimate) variation
    # of mixed embedding dims by vectorizing per distinct length.
    both_clean = (
        a.isNotNull()
        & b.isNotNull()
        & (F.size(a) == F.size(b))
        & ~F.exists(a, lambda x: x.isNull())
        & ~F.exists(b, lambda x: x.isNull())
    )
    return _cos(F.when(both_clean, a), F.when(both_clean, b))


def cosine_rounded_arrow(a: Column, b: Column, digits: int = 6) -> Column:
    """Drop-in replacement for :func:`cosine_rounded` on hot paths:
    Arrow kernel for the fold, JVM F.round for the grid."""
    return F.round(cosine_arrow(a, b), digits)


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
