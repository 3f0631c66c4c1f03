"""Product quantization (PQ) + asymmetric-distance (ADC) ANN search.

PQ is the memory-side half of the standard web-scale ANN stack
(IVF-PQ, Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011): split each D-dim vector into M subvectors,
k-means each subspace to K centroids, and store every vector as M
small codes (here 16 subspaces × 16 centroids → 16 nibbles = 8
bytes/vector instead of 256 bytes of floats — the compression that
lets a 100 TB corpus's index fit in cluster RAM). Search never
decodes: a query builds an M×K table of exact subspace distances,
and each candidate's distance is M table lookups (ADC). adc_rerank
adds the production second stage: exact distances for the ADC
shortlist only.

Determinism (the oracle contract, same posture as kmeans.py): vectors
land on the 1e-6 integer grid up front, every distance is a BIGINT
sum of squares, centroid updates are exact floor-mean divisions, and
seeds are the first K corpus vectors — both engines reproduce the
codebook, the codes, and every ADC distance bit-for-bit.

Scale shapes (r12 revision — guide §1.2: fix the distributed
algorithm first):
- TRAINING runs on the driver in NumPy over the COLLECTED bounded
  sample (TRAIN_SAMPLE=1024 vectors × 64 int64 grid components =
  512 KB — the faiss/MLlib posture: k-means training state is a
  small-sample, centroids-in-memory problem; only indexing/search
  are corpus-scale). The r11 distributed trainer spent 2.5-4 s at
  sf0.1 in tiny-shuffle/job overhead per bench run — two Lloyd
  rounds over 16k sample sub-rows cost more in stage scheduling
  than in arithmetic. All integer ops (bigint squared distances,
  (dist, k) argmin ties to the lower code, exact floor-mean
  updates) are reproduced bit-for-bit, so the DuckDB oracle's CTE
  chain still hash-matches every code.
- code ASSIGNMENT is one map-only Arrow pass: each corpus vector's
  M codes come from NumPy int64 GEMMs against the in-closure
  codebook (kmeans.py::_assign_pandas discipline) — no explode, no
  join, no shuffle; 16 (vec_id, sub, code) rows emitted per vector.
- ADC scoring joins the (vec_id, sub, code) code table — the only
  corpus-sized thing that ever shuffles, at ~2 bytes/vector payload —
  against the broadcast per-query distance table on (sub, code);
  partial sums reduce map-side before the (query_id, vec_id) shuffle.

Reference parity: none (the reference has no ANN); this extends
SURVEY §2.3 similarity search alongside lsh.py / ivf.py /
quantization.py as the memory-bounded scale path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import sql_floordiv
from .kmeans import Q, quantized_arrays

N_DIMS = 64
M = 16  # subspaces
SUB_DIMS = N_DIMS // M  # 4 dims per subspace
K_PQ = 16  # centroids per subspace (codes are nibbles)
PQ_ITERS = 2  # Lloyd rounds per subspace
# Codebooks are trained on a bounded corpus sample (the first
# TRAIN_SAMPLE vec_ids), the standard production posture: training
# cost stays O(sample · iters) while indexing/search stream the full
# corpus. At 100 TB you train on ~1e5-1e6 vectors, never the corpus.
TRAIN_SAMPLE = 1024


def _collect_subvectors(e: DataFrame, upto: int):
    """(ids, V) — vec_id-sorted sample subvectors as int64 arrays:
    ids shape (n,), V shape (n, M, SUB_DIMS). ONE narrow job over the
    bounded sample (vec_id < upto); ≤ TRAIN_SAMPLE·64·8 B collected."""
    rows = (
        quantized_arrays(e)
        .filter(F.col("vec_id") < upto)
        .select("vec_id", "qv")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.array([r.qv for r in rows], dtype=np.int64).reshape(
        len(rows), M, SUB_DIMS
    )
    return ids, V


def train_codebook_np(e: DataFrame, iters: int = PQ_ITERS):
    """Driver-side NumPy mirror of the oracle's training CTE chain
    (sql_pq_ctes): per subspace, ``iters`` Lloyd rounds over the
    vec_id < TRAIN_SAMPLE sample, seeded from subvectors of corpus
    vectors 0..K_PQ-1. Returns {sub: (ks int64[k], C int64[k, SUB_DIMS])}
    with ks ascending — k rides along explicitly so a cluster that
    empties during training can never silently renumber the codes
    behind it.

    Bit-exactness: distances are int64 sums of squares (|component| ≤
    1e6 ⇒ |sq sum| ≪ 2⁶³ — no overflow), argmin takes the FIRST
    minimum over the k-ascending axis (== the SQL (dist, k)
    ROW_NUMBER tie-break), and updates are exact floor divisions
    (Python // == SQL's subtract-mod floor division for any sign)."""
    ids, V = _collect_subvectors(e, TRAIN_SAMPLE)
    seed_mask = ids < K_PQ
    cents = {}
    for sub in range(M):
        ks = ids[seed_mask].astype(np.int64)
        C = V[seed_mask, sub, :].copy()
        cents[sub] = (ks, C)
    for _ in range(iters):
        new_cents = {}
        for sub in range(M):
            ks, C = cents[sub]
            X = V[:, sub, :]  # (n, SUB_DIMS)
            # ||x - c||² = xx - 2xC' + cc — exact in int64 at grid scale.
            D = (
                (X * X).sum(axis=1)[:, None]
                - 2 * (X @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            idx = D.argmin(axis=1)  # first min == ties to lower k
            nk, nC = [], []
            for j in range(len(ks)):
                members = X[idx == j]
                if len(members):
                    nk.append(int(ks[j]))
                    # exact floor-mean per dim (SQL floordiv semantics)
                    nC.append(members.sum(axis=0) // len(members))
            new_cents[sub] = (
                np.array(nk, dtype=np.int64),
                np.array(nC, dtype=np.int64).reshape(len(nk), SUB_DIMS),
            )
        cents = new_cents
    return cents


def _assign_codes_np(e: DataFrame, cents) -> DataFrame:
    """(vec_id, sub, code) — nearest codebook entry per subvector,
    ties to the lower code, for the FULL corpus: ONE map-only Arrow
    pass with the codebook in the task closure (no explode, no join,
    no shuffle — the kmeans.py::_assign_pandas discipline)."""
    plain = {int(s): (ks.tolist(), C.tolist()) for s, (ks, C) in cents.items()}

    def assign_batches(batches):
        import numpy as _np
        import pandas as _pd

        C_by_sub = {
            s: (_np.array(ks, dtype=_np.int64),
                _np.array(C, dtype=_np.int64))
            for s, (ks, C) in plain.items()
        }
        for pdf in batches:
            if pdf.empty:
                continue
            Vm = _np.array(pdf["qv"].tolist(), dtype=_np.int64).reshape(
                len(pdf), M, SUB_DIMS
            )
            vid = pdf["vec_id"].to_numpy()
            out_vid = _np.repeat(vid, M)
            out_sub = _np.tile(_np.arange(M, dtype=_np.int32), len(pdf))
            out_code = _np.empty((len(pdf), M), dtype=_np.int32)
            for s in range(M):
                ks, C = C_by_sub[s]
                X = Vm[:, s, :]
                D = (
                    (X * X).sum(axis=1)[:, None]
                    - 2 * (X @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
                out_code[:, s] = ks[D.argmin(axis=1)]
            yield _pd.DataFrame(
                {
                    "vec_id": out_vid,
                    "sub": out_sub,
                    "code": out_code.reshape(-1),
                }
            )

    return quantized_arrays(e).mapInPandas(
        assign_batches, "vec_id bigint, sub int, code int"
    )


def pq_codes(e: DataFrame, iters: int = PQ_ITERS) -> DataFrame:
    """(vec_id, sub, code) — the 2-byte/vector PQ index."""
    return _assign_codes_np(e, train_codebook_np(e, iters))


def _dtab_df(e: DataFrame, cents, n_queries: int) -> DataFrame:
    """Per-query distance table (query_id, sub, code, pd) — n_queries
    × M × K exact int64 entries, computed driver-side from the
    collected query vectors (n_queries ≤ a few; the table is what the
    r11 path also broadcast) and shipped as a literal DataFrame."""
    qids, QV = _collect_subvectors(e, n_queries)
    rows = []
    for i, qid in enumerate(qids.tolist()):
        for s in range(M):
            ks, C = cents[s]
            x = QV[i, s, :]
            d = ((x[None, :] - C) ** 2).sum(axis=1)
            for j in range(len(ks)):
                rows.append((int(qid), s, int(ks[j]), int(d[j])))
    return e.sparkSession.createDataFrame(
        rows, "query_id bigint, sub int, code int, pd bigint"
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def adc_topk(
    e: DataFrame, n_queries: int, k: int, iters: int = PQ_ITERS
) -> DataFrame:
    """(query_id, neighbor_id, adc_dist, rank) — top-k by asymmetric
    PQ distance for query vectors vec_id < n_queries (self excluded)."""
    from pyspark.sql import Window as W

    cents = train_codebook_np(e, iters)
    codes = _assign_codes_np(e, cents)
    dtab = _dtab_df(e, cents, n_queries)
    scored = (
        codes.join(F.broadcast(dtab), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pd").alias("adc_dist"))
    )
    w = W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


SHORTLIST = 50  # ADC candidates per query that get an exact rerank


def adc_rerank_topk(
    e: DataFrame,
    n_queries: int,
    k: int,
    shortlist: int = SHORTLIST,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """(query_id, neighbor_id, l2_dist, rank) — the production IVF-PQ
    search shape: ADC over compressed codes prunes the corpus to a
    ``shortlist`` per query, then ONLY those candidates get an exact
    (full-vector, integer-grid) distance and the final top-k ranking.

    Scale shape: the corpus's raw vectors are touched exactly twice —
    once at indexing (codes) and once per surviving candidate (the
    shortlist join is a broadcast of n_queries·shortlist ids against
    the corpus scan; no corpus shuffle). Recall is governed by
    ``shortlist``, not by code width — the knob a 100 TB deployment
    actually turns."""
    from pyspark.sql import Window as W

    short = adc_topk(e, n_queries, shortlist, iters).select(
        "query_id", "neighbor_id"
    )
    qv = quantized_arrays(e)
    qvecs = qv.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    exact = (
        qv.join(
            F.broadcast(short), qv.vec_id == short.neighbor_id
        )
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _sqdist(F.col("qv"), F.col("q_qv")).alias("l2_dist"),
        )
    )
    w = W.partitionBy("query_id").orderBy("l2_dist", "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "l2_dist", "rank")
    )


NPROBE = 3  # IVF cells probed per query


def ivfpq_topk(
    e: DataFrame,
    n_queries: int,
    k: int,
    nprobe: int = NPROBE,
    iters: int = PQ_ITERS,
    shortlist: int = SHORTLIST,
) -> DataFrame:
    """(query_id, neighbor_id, l2_dist, rank) — the full IVF-PQ stack:
    coarse IVF cells prune the corpus to the query's ``nprobe``
    nearest cells, ADC over PQ codes scores only those candidates,
    and the ADC shortlist gets an exact full-vector rerank.

    Scale shape: cell assignment and code assignment are both
    map-only passes over the corpus against broadcast models; the
    candidate set (≈ nprobe/n_cells of the corpus per query) is the
    only thing scored, and raw vectors are touched just for the
    shortlist. nprobe and shortlist are the recall/cost knobs — and
    they interact: with a TIGHT shortlist, raising nprobe alone can
    DROP recall (extra ADC-preferred candidates crowd true neighbors
    out of the fixed-size shortlist; observed empirically in
    tests/test_pq_recall.py). Recall is monotone in nprobe only when
    shortlist covers the candidate set — tune the two together.
    At 100 TB the code
    index would additionally be PARTITIONED BY cell so a probe reads
    only its cells' files — the same partition-pruning story as any
    partitioned scan."""
    from pyspark.sql import Window as W

    from ..functions.vectors import as_double_array, cosine_rounded
    from .ivf import N_CENTROIDS, assign_cells

    cells = assign_cells(e).select("vec_id", "cell")
    # nprobe nearest cells per query (same rounded-cosine ranking the
    # cell assignment uses, so probe #1 is always the query's own cell).
    ivf_cents = F.broadcast(
        e.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("centroid_id"),
            as_double_array("embedding").alias("cv"),
        )
    )
    qv = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("v")
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("cos"), "centroid_id")
    probe = (
        qv.join(ivf_cents, how="cross")
        .select(
            "query_id",
            "centroid_id",
            cosine_rounded(F.col("v"), F.col("cv")).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("centroid_id").alias("cell"))
    )
    cand = cells.join(F.broadcast(probe), "cell").select("query_id", "vec_id")

    cents = train_codebook_np(e, iters)
    codes = _assign_codes_np(e, cents)
    dtab = _dtab_df(e, cents, n_queries)
    adc = (
        codes.join(cand, "vec_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(dtab), ["query_id", "sub", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pd").alias("adc_dist"))
    )
    ws = W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    qarr = quantized_arrays(e)
    qvecs = qarr.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    exact = (
        qarr.join(F.broadcast(short), qarr.vec_id == short.neighbor_id)
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _sqdist(F.col("qv"), F.col("q_qv")).alias("l2_dist"),
        )
    )
    wr = W.partitionBy("query_id").orderBy("l2_dist", "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "l2_dist", "rank")
    )


# ---- DuckDB SQL mirror ----------------------------------------------------

def sql_pq_ctes(iters: int = PQ_ITERS) -> str:
    """CTE chain sq, sc0, sd1, sa1, sc1, ... mirroring train_codebook +
    codes exactly (long form; all-integer, so shape can't change
    values). Final CTEs: sc{iters} (codebook) and scode (codes)."""
    parts = [
        f"""sq AS (
      SELECT vec_id, CAST(r.i // {SUB_DIMS} AS INT) AS sub,
             CAST(r.i % {SUB_DIMS} AS INT) AS dim,
             CAST(FLOOR(CAST(embedding[r.i + 1] AS DOUBLE) * {Q}) AS BIGINT)
               AS qx
      FROM embeddings, UNNEST(range(0, {N_DIMS})) AS r(i)),
    st AS (SELECT * FROM sq WHERE vec_id < {TRAIN_SAMPLE}),
    sc0 AS (SELECT sub, CAST(vec_id AS INT) AS k, dim, qx AS c
            FROM st WHERE vec_id < {K_PQ})""",
    ]
    for it in range(1, iters + 1):
        prev = f"sc{it - 1}"
        parts.append(
            f"""sd{it} AS (
      SELECT q.vec_id, q.sub, c.k,
             CAST(SUM((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS dist
      FROM st q JOIN {prev} c ON q.sub = c.sub AND q.dim = c.dim
      GROUP BY 1, 2, 3),
    sa{it} AS (
      SELECT vec_id, sub, k, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                     ORDER BY dist, k) AS rn
        FROM sd{it}) WHERE rn = 1),
    sc{it} AS (
      SELECT q.sub, a.k, q.dim,
             {sql_floordiv('SUM(q.qx)', 'COUNT(*)')} AS c
      FROM st q JOIN sa{it} a ON q.vec_id = a.vec_id AND q.sub = a.sub
      GROUP BY 1, 2, 3)"""
        )
    parts.append(
        f"""scode AS (
      SELECT vec_id, sub, k AS code FROM (
        SELECT d.*, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                       ORDER BY dist, k) AS rn
        FROM (SELECT q.vec_id, q.sub, c.k,
                     CAST(SUM((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS dist
              FROM sq q JOIN sc{iters} c ON q.sub = c.sub AND q.dim = c.dim
              GROUP BY 1, 2, 3) d) WHERE rn = 1)"""
    )
    return ",\n    ".join(parts)
