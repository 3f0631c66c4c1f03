"""K-means (Lloyd) clustering over embeddings in EXACT integer
arithmetic — the training loop behind IVF cell assignment
(similarity/ivf.py uses fixed seed centroids; this is how they would
actually be trained).

Why integers: a float k-means can never be hash-checked cross-engine —
centroid means are order-dependent double sums. Here every component is
quantized to a 1e-6 grid up front (``qx = FLOOR(x * 1e6)``, one exact
IEEE multiply + floor, identical in Spark and DuckDB), distances are
bigint sums of squares, and centroid updates are exact floor
divisions. Every iteration is therefore bit-reproducible under any
partitioning/shuffle schedule, in both engines.

Shapes (and why this survives 100 TB):
- assignment is MAP-ONLY: each vector row cross-joins the broadcast
  K-row centroid-ARRAY table and folds the squared distance inside
  codegen (zip_with + aggregate over bigints — exact, so any fold
  schedule agrees); the argmin is one groupBy(vec_id) of
  min(struct(dist, k)) — a single n-row shuffle per round, not 64n;
- update: posexplode the kept assignment and groupBy (k, dim) —
  512 groups, partial-aggregated map-side;
- the driver loop moves only the tiny centroid table per round —
  the corpus is scanned once per iteration and never re-shuffled.
The DuckDB oracle keeps the simpler long-form join shape: every
intermediate is an exact integer, so physical shape cannot change a
single value.

Reference parity: the reference repo has no clustering; this extends
the SURVEY §2 similarity-search category (IVF training) the same way
its MapReduce pipeline extends matmul.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import floordiv, sql_floordiv

N_DIMS = 64
K = 8  # clusters; initial centroids = vectors 0..K-1
Q = 1_000_000  # quantization grid (1e-6 component resolution)
ITERATIONS = 2


def quantized_arrays(e: DataFrame) -> DataFrame:
    """(vec_id, qv array<bigint>) — embeddings on the integer grid."""
    return e.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * Q).cast("bigint"),
        ).alias("qv"),
    )


def quantized_dims(e: DataFrame) -> DataFrame:
    """(vec_id, dim, qx) — long form of :func:`quantized_arrays` (the
    centroid-update shape)."""
    return quantized_arrays(e).select(
        "vec_id", F.posexplode("qv").alias("dim", "qx")
    )


def _cent_arrays(cents: DataFrame) -> DataFrame:
    """(k, cv array<bigint>) — long-form centroids packed into
    dim-ordered arrays (512 rows in, K rows out)."""
    return cents.groupBy("k").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, c))), t -> t.c)"
        ).alias("cv")
    )


def assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, k, dist) — nearest centroid by exact squared L2
    distance, ties broken on the lower cluster id.

    ``q`` is long-form (vec_id, dim, qx); it is repacked to arrays and
    scored MAP-SIDE against the broadcast K-row centroid-array table
    (zip_with + bigint fold in codegen); the argmin is one
    min(struct(dist, k)) aggregate — the only shuffle is n rows keyed
    by vec_id."""
    qarr = q.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, qx))), t -> t.qx)"
        ).alias("qv")
    )
    return assign_arrays(qarr, _cent_arrays(cents))


def _cent_literal_rows(rows):
    """array<struct<k,cv>> LITERAL of the collected K-row centroid
    table — the idiomatic Spark k-means shape (MLlib likewise collects
    the centroids each round and ships them as a broadcast value, not
    a relation). K·N_DIMS integers ride in the plan itself, so
    assignment needs no join node at all: no BroadcastNestedLoopJoin,
    and no per-vector argmin shuffle either — the K-candidate fold
    happens inside whole-stage codegen, map-only, exactly like the PQ
    code assignment (pq.py::_assign_codes). Only viable while K is
    small (see K_LITERAL_MAX)."""
    return F.array(
        *[
            F.struct(
                F.lit(int(r.k)).cast("bigint").alias("k"),
                F.array(*[F.lit(int(c)) for c in r.cv])
                .cast("array<bigint>")
                .alias("cv"),
            )
            for r in rows
        ]
    )


def assign_arrays(qarr: DataFrame, cent_arr: DataFrame) -> DataFrame:
    """(vec_id, k, dist) via the Arrow/NumPy integer GEMM for EVERY K
    (r12): the r11 small-K literal-fold fast path was measured SLOWER
    than the GEMM even at K=8 — 0.6-0.9 s vs 0.2-0.3 s per 2000-row
    pass at sf0.1, and 2.1-2.7 s vs 0.24-0.33 s at K=31 — because
    zip_with/aggregate folds evaluate interpreted per element while
    the GEMM is one int64 matmul per Arrow batch (guide §4.2). Both
    paths are bit-identical (integer arithmetic; pinned by
    tests/test_sketches_kmeans.py::test_assignment_paths_bit_identical
    against :func:`_assign_fold_literal`)."""
    rows = sorted(cent_arr.collect(), key=lambda r: r.k)
    return _assign_pandas(qarr, rows)


def _assign_fold_literal(qarr: DataFrame, rows) -> DataFrame:
    """REFERENCE implementation (the r1-r11 small-K production path):
    K-candidate literal fold inside whole-stage codegen. Off every
    query path since r12 (see :func:`assign_arrays`); kept as the
    independent second implementation the bit-identity test pins the
    GEMM against."""
    dist_fold = lambda cv: F.aggregate(  # noqa: E731
        F.zip_with(F.col("qv"), cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    cands = F.transform(
        _cent_literal_rows(rows),
        lambda p: F.struct(
            dist_fold(p["cv"]).alias("dist"), p["k"].alias("k")
        ),
    )
    best = F.array_min(cands)  # lexicographic: min dist, ties to low k
    return qarr.select(
        "vec_id", best["k"].alias("k"), best["dist"].alias("dist")
    )


def _assign_pandas(qarr: DataFrame, rows) -> DataFrame:
    """Large-K assignment via Arrow-batched NumPy integer GEMM — the
    matrix/block.py justification applies verbatim: Spark's
    higher-order-function folds (zip_with/aggregate) are interpreted
    per element, and the sf1 probe measured the K=312 fold at ~60 s
    for 400M bigint ops where NumPy's int64 ``Q @ Cᵀ`` does them in
    milliseconds. ||q−c||² expands to qq − 2q·c + cc so the whole
    batch is one integer matmul; everything stays int64-exact
    (|component| ≤ 1e6 ⇒ |dot| ≤ 6.4e13 ≪ 2⁶³), so the result is
    bit-identical to the fold and to the DuckDB oracle. argmin takes
    the FIRST minimum and the centroid axis is sorted by k — the same
    (dist, k) lexicographic tie-break as min(struct). Map-only: no
    shuffle, centroids travel in the task closure."""
    import numpy as np

    C = np.array([[int(c) for c in r.cv] for r in rows], dtype=np.int64)
    ks = np.array([int(r.k) for r in rows], dtype=np.int64)
    cc = (C * C).sum(axis=1)

    def assign_batches(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if pdf.empty:
                # An empty Arrow batch (filter boundary upstream) makes
                # np.array(tolist()) 1-D shape (0,) — the GEMM would
                # raise. Nothing to assign; skip.
                continue
            # Qm, not Q: the module-level Q is the 1e-6 quantization grid.
            Qm = _np.array(pdf["qv"].tolist(), dtype=_np.int64)
            qq = (Qm * Qm).sum(axis=1)
            D = qq[:, None] - 2 * (Qm @ C.T) + cc[None, :]
            idx = D.argmin(axis=1)
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "k": ks[idx],
                    "dist": D[_np.arange(len(idx)), idx],
                }
            )

    return qarr.mapInPandas(
        assign_batches, "vec_id bigint, k bigint, dist bigint"
    )


def update(q: DataFrame, a: DataFrame) -> DataFrame:
    """(k, dim, c) — new centroids: exact floor(mean) per dimension.
    functions.exact.floordiv is an exact integer floor division in
    both engines (the subtraction makes the numerator divisible, so
    the double division is exact)."""
    s = F.sum("qx")
    n = F.count("*")
    return (
        q.join(a.select("vec_id", "k"), "vec_id")
        .groupBy("k", "dim")
        .agg(floordiv(s, n).alias("c"))
    )


def lloyd(
    e: DataFrame,
    iterations: int = ITERATIONS,
    k: int | None = None,
    sample: int | None = None,
):
    """Run ``iterations`` Lloyd rounds; returns (assignments,
    centroids) DataFrames after the final round. ``k`` overrides the
    default cluster count (SemDeDup scales it with corpus size).

    ``sample`` switches to SAMPLED TRAINING (the pq.py posture, and
    the only affordable one once K grows with n): rounds
    1..iterations−1 assign and update over the deterministic sample
    ``vec_id < sample`` only, and the FINAL round assigns the full
    corpus against the trained centroids with no further update — so
    the corpus pays one O(n·K·d) pass instead of one per iteration.
    When the sample covers the corpus the result is bit-identical to
    unsampled lloyd (final assignment is against the same
    (iterations−1)-round centroids), which is why the gate-SF answers
    don't change."""
    kk = K if k is None else k
    qarr_full = quantized_arrays(e)
    qarr_train = (
        qarr_full if sample is None else qarr_full.filter(F.col("vec_id") < sample)
    )
    q_train = qarr_train.select("vec_id", F.posexplode("qv").alias("dim", "qx"))
    cent_arr = qarr_train.filter(F.col("vec_id") < kk).select(
        F.col("vec_id").alias("k"), F.col("qv").alias("cv")
    )
    a = None
    cents = None
    for i in range(iterations):
        last = i == iterations - 1
        if sample is not None and last:
            a = assign_arrays(qarr_full, cent_arr)
            break
        a = assign_arrays(qarr_train, cent_arr)
        cents = update(q_train, a)
        cent_arr = _cent_arrays(cents)
    return a, cents


# Corpus-adaptive cluster count: K(n) = max(K, floor(n / TARGET_CELL))
# — the SemDeDup lever that keeps the within-cell pair cost bounded
# (Σ|cell|² ≈ n·TARGET_CELL) as the corpus grows. At the gate SF
# (n=500) this equals the default K=8, so the fixed-K trainer queries
# and the adaptive consumers agree there.
TARGET_CELL = 64
# Deterministic training sample for adaptive-K runs: vec_id < 4096.
# Training cost is O(sample·K·d·iters); only the final assignment
# pass touches the corpus (once).
TRAIN_SAMPLE = 4096


def adaptive_k(n: int) -> int:
    return min(max(K, n // TARGET_CELL), TRAIN_SAMPLE)


def sql_adaptive_k() -> str:
    """DuckDB scalar mirroring :func:`adaptive_k` over ``embeddings``."""
    return (
        f"(SELECT LEAST(GREATEST({K}, CAST(COUNT(*) // {TARGET_CELL} AS BIGINT)), "
        f"{TRAIN_SAMPLE}) FROM embeddings)"
    )


# ---- DuckDB SQL mirror ----------------------------------------------------

def sql_lloyd_ctes(
    iterations: int = ITERATIONS,
    k_sql: str | None = None,
    sample_sql: str | None = None,
) -> str:
    """CTE chain q, c0, d1, a1, c1, d2, a2, c2, ... mirroring
    :func:`lloyd` exactly. ``k_sql`` overrides the seed-count SQL
    expression (e.g. :func:`sql_adaptive_k`); ``sample_sql`` mirrors
    sampled training (train rounds restricted to vec_id < sample,
    final round assigning the full corpus, no final update)."""
    kk = str(K) if k_sql is None else k_sql
    parts = [
        f"""q AS (
      SELECT vec_id, r.i AS dim,
             CAST(FLOOR(CAST(embedding[r.i + 1] AS DOUBLE) * {Q}) AS BIGINT)
               AS qx
      FROM embeddings, UNNEST(range(0, {N_DIMS})) AS r(i)),
    c0 AS (SELECT vec_id AS k, dim, qx AS c FROM q WHERE vec_id < {kk})""",
    ]
    for it in range(1, iterations + 1):
        prev = f"c{it - 1}"
        last = it == iterations
        train_filter = (
            f" AND q.vec_id < {sample_sql}"
            if sample_sql is not None and not last
            else ""
        )
        parts.append(
            f"""d{it} AS (
      SELECT q.vec_id, c.k,
             CAST(SUM((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS dist
      FROM q JOIN {prev} c ON q.dim = c.dim{train_filter}
      GROUP BY 1, 2),
    a{it} AS (
      SELECT vec_id, k, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dist, k) AS rn
        FROM d{it}) WHERE rn = 1)"""
        )
        if sample_sql is not None and last:
            break  # sampled mode: no update after the full assignment
        parts.append(
            f"""c{it} AS (
      SELECT a.k, q.dim,
             {sql_floordiv('SUM(q.qx)', 'COUNT(*)')} AS c
      FROM q JOIN a{it} a ON q.vec_id = a.vec_id
      GROUP BY 1, 2)"""
        )
    return ",\n    ".join(parts)
