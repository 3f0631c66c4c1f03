"""SQ8 scalar quantization for embeddings: L2-normalize, train a
global symmetric scale over the corpus, encode to signed 8-bit codes,
and rank by exact integer dot products.

Design (the symmetric int8 recipe vector stores use for the cosine
metric):
- vectors are L2-NORMALIZED first — cosine becomes a plain dot
  product, so quantized dots rank like cosines instead of being
  dominated by vector magnitude;
- the quantizer "model" is ONE number: s = max |component| over the
  normalized corpus; codes are floor(x / s * 128) clamped to
  [-128, 127] — symmetric around zero, so the integer dot
  Σ qa·qb ≈ (128/s)²·cosine with no per-dimension distortion (a
  per-dim affine min/max variant was tried first: its dim-dependent
  scales warp the dot and cost ~30 recall points on the fixture);
- scoring is Σ code_q · code_c in bigint — exact integers, so no
  rounding and no order-dependence anywhere.

The 100 TB shape: training is a map-side MAX reduced to one broadcast
scalar; encoding is map-only array math (whole-stage codegen). A
quantized corpus is 64 B/vector instead of 256-512 B; candidate
scoring is integer multiply-adds — the memory/bandwidth lever that
makes billion-vector first-pass scoring feasible. Exact float
rescoring (ann_brute_force_topk's kernel) reranks the shortlist.

Cross-engine exactness: normalization and scaling are identical double
expressions in both engines → identical codes; downstream sums are
INTEGER, hence order-independent under any shuffle/partial-agg
schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, dot

N_DIMS = 64
HALF_LEVELS = 128  # signed 8-bit: codes in [-128, 127]


def _normalized(e: DataFrame) -> DataFrame:
    """(vec_id, nv array<double>) — unit-length embedding."""
    v = as_double_array("embedding")
    nrm = F.sqrt(dot(v, v))
    return e.select("vec_id", F.transform(v, lambda x: x / nrm).alias("nv"))


def _scale(e: DataFrame) -> DataFrame:
    """One-row (s) global absmax over normalized components — per-row
    array_max map-side, then a scalar MAX: an n-row aggregate, never
    the 64n exploded form."""
    row_max = F.array_max(F.transform(F.col("nv"), F.abs))
    return _normalized(e).agg(F.max(row_max).alias("s"))


def code_arrays(e: DataFrame) -> DataFrame:
    """(vec_id, codes array<int>) — dim-ordered code vectors, built
    MAP-ONLY: normalize -> broadcast the one-row scale -> transform.
    No explode, no collect_list shuffle; encoding runs at scan
    bandwidth, which is the point of SQ8 at 10^9 vectors."""
    coded = F.transform(
        F.col("nv"),
        lambda x: F.least(
            F.floor(x / F.col("s") * HALF_LEVELS), F.lit(HALF_LEVELS - 1)
        ).cast("int"),
    )
    return (
        _normalized(e)
        .crossJoin(F.broadcast(_scale(e)))
        .select("vec_id", coded.alias("codes"))
    )


def code_rows(e: DataFrame) -> DataFrame:
    """(vec_id, dim, code) long form of :func:`code_arrays` (kept for
    dim-keyed consumers; the hot paths use the array form)."""
    return code_arrays(e).select(
        "vec_id", F.posexplode("codes").alias("dim", "code")
    )


def int_dot(a, b):
    """Exact integer dot of signed code arrays (bigint accumulate —
    order-independent, unlike float folds)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("bigint") * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def sq8_scored_arrow(e: DataFrame, n_queries: int) -> DataFrame:
    """(query_id, neighbor_id, qdot) — every corpus vector scored
    against the n_queries query set by exact int8-code dot product, as
    ONE map-only Arrow pass (r12, guide §4.2).

    The r11 shape evaluated code_arrays in two plan branches (each
    re-running the interpreted normalize fold + the scale agg) and
    scored 64-dim int_dot folds per pair in a broadcast

    nested-loop; this pass collects the one-row scale and the
    n_queries raw vectors driver-side (two narrow jobs over bounded
    data), then per Arrow batch re-derives codes with the IDENTICAL
    IEEE op sequence — seqsum-of-squares norm in index order,
    x/nrm, (nv/s)*128, floor, clamp 127 — and one int64 GEMM for all
    dots. Integer dots are order-independent, so results are
    bit-identical to the fold path (the oracle recomputes everything
    in SQL and hash-checks it)."""
    s = float(_scale(e).collect()[0]["s"])
    qrows = sorted(
        e.filter(F.col("vec_id") < n_queries)
        .select("vec_id", as_double_array("embedding").alias("v"))
        .collect(),
        key=lambda r: r.vec_id,
    )
    qids = [int(r.vec_id) for r in qrows]
    qvecs = [list(r.v) for r in qrows]
    half = HALF_LEVELS

    def op(batches):
        import numpy as np
        import pandas as pd

        def codes_of(A):
            P = A * A
            acc = np.zeros(len(A), dtype=np.float64)
            for i in range(A.shape[1]):  # seqsum: the fold's order
                acc = acc + P[:, i]
            if (acc == 0.0).any():
                # The JVM fold raises DIVIDE_BY_ZERO here under the
                # session's ANSI mode; the old kernel cast NaN codes to
                # an undefined int64 instead (ADVICE r12). Match the
                # fold's failure class: loud, never silently wrong.
                raise ValueError(
                    "sq8 codes: zero-norm embedding (division by zero "
                    "in normalization) violates the corpus contract"
                )
            nv = A / np.sqrt(acc)[:, None]
            return np.minimum(
                np.floor(nv / s * half), float(half - 1)
            ).astype(np.int64)

        Qc = codes_of(np.array(qvecs, dtype=np.float64))
        qid = np.array(qids, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            if pdf["v"].isna().any():
                # The fold path would propagate null qdots here; the
                # corpus contract (generator-made embeddings) forbids
                # null rows, so fail loudly instead of crashing inside
                # np.array with an opaque shape error (ADVICE r12).
                raise ValueError(
                    "sq8_scored_arrow: null embedding row violates "
                    "the corpus contract"
                )
            A = np.array(pdf["v"].tolist(), dtype=np.float64)
            D = codes_of(A) @ Qc.T  # (m, nq) exact int64 dots
            nid = pdf["vec_id"].to_numpy()
            m, nq = D.shape
            out_q = np.tile(qid, m)
            out_n = np.repeat(nid, nq)
            mask = out_q != out_n
            yield pd.DataFrame(
                {
                    "query_id": out_q[mask],
                    "neighbor_id": out_n[mask],
                    "qdot": D.reshape(-1)[mask],
                }
            )

    return e.select("vec_id", as_double_array("embedding").alias("v")).mapInPandas(
        op, "query_id bigint, neighbor_id bigint, qdot bigint"
    )


def sql_code_rows() -> str:
    """DuckDB mirror of :func:`code_rows` (CTE body)."""
    nv = (
        "list_transform(embedding::DOUBLE[], x -> x / "
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))"
    )
    return f"""
    SELECT d.vec_id, d.dim,
           CAST(LEAST(FLOOR(d.x / s.s * {HALF_LEVELS}), {HALF_LEVELS - 1}) AS INT)
             AS code
    FROM (SELECT vec_id, r.i AS dim, nv[r.i + 1] AS x
          FROM (SELECT vec_id, {nv} AS nv FROM embeddings),
               UNNEST(range(0, {N_DIMS})) AS r(i)) d
    CROSS JOIN (SELECT MAX(abs(nv[r.i + 1])) AS s
                FROM (SELECT vec_id, {nv} AS nv FROM embeddings),
                     UNNEST(range(0, {N_DIMS})) AS r(i)) s
    """
