"""Random-hyperplane LSH (sign-random-projection) bucketing — the
scale path for similarity search: bucket once, then search only within
buckets.

The hyperplanes are ±1 sign vectors derived from md5 (driver-side,
seeded) and inlined as literals into BOTH the Spark plan and the
DuckDB oracle SQL — so bucketing is exactly reproducible everywhere.
Bucket bit p = [dot(v, plane_p) > 0].

At 100 TB the corpus gets one narrow pass (8 fold-dots per row, no
shuffle) producing a bucket id; the ANN join is then an equi-join on
the bucket id instead of a cross-join — the classic 10^4× candidate
reduction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array

N_PLANES = 8
DIM = 64

# Corpus-adaptive plane count for SELF-join consumers (the kNN graph):
# with planes fixed, self-join candidate volume grows as 9n²/2^planes —
# the sf1 probe measured knn_graph_lsh at 11.6× wall for 10× data.
# Scaling 2^planes ∝ n/KNN_TARGET_BUCKET keeps the expected bucket
# occupancy (and so candidates per vector) constant. Broadcast-query
# consumers (ann_lsh_*) stay at N_PLANES: their corpus-side cost is
# already linear.
KNN_TARGET_BUCKET = 32  # target mean vectors per bucket
N_PLANES_MAX = 16  # oracle mirror computes this fixed width, then masks


def adaptive_planes(
    n: int,
    target: int = KNN_TARGET_BUCKET,
    lo: int = N_PLANES,
    hi: int = N_PLANES_MAX,
) -> int:
    """Smallest p in [lo, hi] with 2^p >= ceil(n / target) — pure
    integer arithmetic so the SQL mirror (:func:`sql_adaptive_planes`)
    agrees for every n."""
    need = (n + target - 1) // target
    p = (need - 1).bit_length() if need > 1 else 0
    return max(lo, min(hi, p))


def sql_adaptive_planes(
    table: str = "embeddings",
    target: int = KNN_TARGET_BUCKET,
    lo: int = N_PLANES,
    hi: int = N_PLANES_MAX,
) -> str:
    """DuckDB scalar mirroring :func:`adaptive_planes` — an integer
    CASE ladder (no log2: libm rounding at exact powers of two could
    disagree across engines)."""
    need = f"(((SELECT COUNT(*) FROM {table}) + {target - 1}) // {target})"
    cases = " ".join(f"WHEN {need} <= {1 << p} THEN {p}" for p in range(lo, hi))
    return f"(CASE {cases} ELSE {hi} END)"


def _sign(plane: int, dim: int) -> float:
    """Deterministic ±1 from md5 parity (portable: pure data)."""
    h = hashlib.md5(f"plane{plane}|dim{dim}".encode()).hexdigest()
    return 1.0 if int(h[:8], 16) % 2 == 0 else -1.0


def plane_signs(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    return [[_sign(p, d) for d in range(dim)] for p in range(n_planes)]


def bucket_expr(vec: Column, n_planes: int = N_PLANES, dim: int = DIM) -> Column:
    """Bucket id 0..2^n_planes-1 from the sign pattern of plane dots."""
    planes = plane_signs(n_planes, dim)
    bucket = F.lit(0).cast("bigint")
    for p, signs in enumerate(planes):
        signs_col = F.array(*[F.lit(s) for s in signs])
        dot_p = F.aggregate(
            F.zip_with(vec, signs_col, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_p > 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def bucket_arrow(vec: Column, n_planes: int = N_PLANES, dim: int = DIM) -> Column:
    """Arrow/NumPy drop-in for :func:`bucket_expr` on hot paths —
    bit-identical bucket ids (pinned by tests/test_vectors_arrow.py).

    The fold path evaluates n_planes interpreted zip_with/aggregate
    dots per row; r12 measured the 8-plane fold at ~1.4-1.8 s per
    2000-row bucketing pass at sf0.1 where this kernel is one
    vectorized multiply + dim sequential adds per plane for the whole
    batch (guide §4.2). The IEEE-754 operation sequence per (row,
    plane) is EXACTLY the fold's — elementwise v*sign products, then
    accumulation in array-index order from a 0.0 seed — so the sign
    of every dot, and therefore every bucket bit, is bit-identical.
    The fold's null contract is mirrored JVM-side: a null array, a
    null element, or a length mismatch makes every plane dot NULL,
    and `WHEN dot > 0` then contributes 0 for every plane — bucket 0."""
    from pyspark.sql.functions import pandas_udf

    signs = plane_signs(n_planes, dim)

    @pandas_udf("bigint")
    def _bucket(va):
        import numpy as np
        import pandas as pd

        if len(va) == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        out = np.zeros(len(va), dtype=np.int64)
        valid = (~va.isna()).to_numpy()
        vidx = np.flatnonzero(valid)
        if len(vidx):
            lengths = np.array([len(x) for x in va.iloc[vidx]])
            sel = vidx[lengths == dim]
            if len(sel):
                V = np.array(va.iloc[sel].tolist(), dtype=np.float64)
                S = np.array(signs, dtype=np.float64)  # (planes, dim)
                P = V[:, None, :] * S[None, :, :]  # (m, planes, dim)
                acc = np.zeros((len(sel), len(signs)), dtype=np.float64)
                for i in range(dim):
                    acc = acc + P[:, :, i]
                bits = (acc > 0).astype(np.int64)
                weights = np.left_shift(
                    np.int64(1), np.arange(len(signs), dtype=np.int64)
                )
                out[sel] = (bits * weights[None, :]).sum(axis=1)
        return pd.Series(out)

    # Null-element rows: the kernel above only guards null/ragged
    # arrays; mirror the fold's null-element contract JVM-side (the
    # cosine_arrow discipline) by nulling such inputs first — a null
    # input row yields bucket 0 via the `valid` mask.
    clean = vec.isNotNull() & ~F.exists(vec, lambda x: x.isNull())
    return _bucket(F.when(clean, vec))


def bucketize(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = as_double_array(vec_col)
    return corpus.withColumn("bucket", bucket_arrow(v))


def probe_buckets(bucket, n_planes: int = N_PLANES):
    """Multi-probe set: the query's bucket plus every bucket at
    Hamming distance 1 (one plane's sign flipped) — the standard
    recall lever that probes near-boundary buckets instead of adding
    hash tables. Returns an array column of n_planes+1 bucket ids."""
    from pyspark.sql import functions as F

    return F.array(
        bucket, *[bucket.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )


def sql_probe_buckets(bucket: str, n_planes: int = N_PLANES) -> str:
    ids = ", ".join([bucket] + [f"xor({bucket}, {1 << p})" for p in range(n_planes)])
    return f"[{ids}]"


# ---- DuckDB SQL mirrors ---------------------------------------------------

def sql_bucket_expr(vec: str, n_planes: int = N_PLANES, dim: int = DIM) -> str:
    planes = plane_signs(n_planes, dim)
    terms = []
    for p, signs in enumerate(planes):
        arr = "[" + ", ".join(str(s) for s in signs) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product({vec}::DOUBLE[], {arr}) > 0"
            f" THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"
