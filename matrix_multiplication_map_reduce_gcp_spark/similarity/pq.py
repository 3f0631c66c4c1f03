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

Scale shapes:
- training touches long-form (vec_id, sub, dim, qx) rows with
  map-side partial aggregation; the codebook (M·K rows) is the only
  thing the driver loop moves;
- code ASSIGNMENT is map-only: each (vec_id, sub) subvector row
  equi-joins the broadcast M-row packed codebook and folds all K
  candidate distances inside codegen (array_min over structs);
- ADC scoring joins the (vec_id, sub, code) code table — the only
  corpus-sized thing that ever shuffles, at ~2 bytes/vector payload —
  against the broadcast per-query distance table on (sub, code);
  partial sums reduce map-side before the (query_id, vec_id) shuffle.

Reference parity: none (the reference has no ANN); this extends
SURVEY §2.3 similarity search alongside lsh.py / ivf.py /
quantization.py as the memory-bounded scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import floordiv, sql_floordiv
from .kmeans import Q, quantized_arrays

N_DIMS = 64
M = 16  # subspaces
SUB_DIMS = N_DIMS // M  # 16 dims per subspace
K_PQ = 16  # centroids per subspace (codes are nibbles)
PQ_ITERS = 2  # Lloyd rounds per subspace
# Codebooks are trained on a bounded corpus sample (the first
# TRAIN_SAMPLE vec_ids), the standard production posture: training
# cost stays O(sample · iters) while indexing/search stream the full
# corpus. At 100 TB you train on ~1e5-1e6 vectors, never the corpus.
TRAIN_SAMPLE = 1024


def _sub_rows(e: DataFrame) -> DataFrame:
    """(vec_id, sub, sv array<bigint>) — quantized subvectors."""
    qv = quantized_arrays(e)
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(M - 1)),
        lambda s: F.struct(
            s.cast("int").alias("sub"),
            F.slice(F.col("qv"), s * SUB_DIMS + 1, SUB_DIMS).alias("sv"),
        ),
    )
    return qv.select(
        "vec_id", F.explode(subs).alias("p")
    ).select("vec_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv"))


def _packed(cents_long: DataFrame) -> DataFrame:
    """(sub, cents array<struct<k,cv>>) — k-labeled codebook rows, one
    per subspace, broadcastable (M rows total). k rides along
    explicitly so a cluster that empties during training can never
    silently renumber the codes behind it (array position is NOT the
    code)."""
    cv = cents_long.groupBy("sub", "k").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, c))), t -> t.c)"
        ).alias("cv")
    )
    return cv.groupBy("sub").agg(
        F.expr("array_sort(collect_list(struct(k, cv)))").alias("cents")
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _assign_codes(sub_rows: DataFrame, packed: DataFrame) -> DataFrame:
    """(vec_id, sub, code, dist) — nearest codebook entry per
    subvector, ties to the lower code. Map-only: 1:1 equi-join with
    the broadcast M-row packed codebook, K-candidate fold in codegen."""
    cands = F.transform(
        F.col("cents"),
        lambda p: F.struct(
            _sqdist(F.col("sv"), p["cv"]).alias("dist"),
            p["k"].cast("int").alias("code"),
        ),
    )
    best = F.array_min(cands)
    return sub_rows.join(F.broadcast(packed), "sub").select(
        "vec_id",
        "sub",
        best["code"].alias("code"),
        best["dist"].alias("dist"),
    )


def train_codebook(e: DataFrame, iters: int = PQ_ITERS) -> DataFrame:
    """(sub, k, dim, c) — PQ codebook after ``iters`` Lloyd rounds per
    subspace, trained on the first TRAIN_SAMPLE corpus vectors. dim is
    LOCAL to the subspace (0..SUB_DIMS-1). Seeds: subvectors of corpus
    vectors 0..K_PQ-1."""
    sub_rows = _sub_rows(e.filter(F.col("vec_id") < TRAIN_SAMPLE))
    q = sub_rows.select(
        "vec_id", "sub", F.posexplode("sv").alias("dim", "qx")
    )
    cents = q.filter(F.col("vec_id") < K_PQ).select(
        "sub", F.col("vec_id").cast("int").alias("k"), "dim", F.col("qx").alias("c")
    )
    for _ in range(iters):
        codes = _assign_codes(sub_rows, _packed(cents))
        s = F.sum("qx")
        n = F.count("*")
        cents = (
            q.join(codes.select("vec_id", "sub", "code"), ["vec_id", "sub"])
            .groupBy("sub", F.col("code").alias("k"), "dim")
            .agg(floordiv(s, n).alias("c"))
            # The codebook is M·K·SUB_DIMS rows (tiny). Materialize it
            # per round — downstream consumers (codes, dtab, rerank)
            # would otherwise re-execute the whole training lineage
            # once EACH (same driver-loop posture as dedup/clusters.py).
            .localCheckpoint(eager=True)
        )
    return cents


def pq_codes(e: DataFrame, iters: int = PQ_ITERS) -> DataFrame:
    """(vec_id, sub, code) — the 2-byte/vector PQ index."""
    cents = train_codebook(e, iters)
    return _assign_codes(_sub_rows(e), _packed(cents)).select(
        "vec_id", "sub", "code"
    )


def adc_topk(
    e: DataFrame, n_queries: int, k: int, iters: int = PQ_ITERS
) -> DataFrame:
    """(query_id, neighbor_id, adc_dist, rank) — top-k by asymmetric
    PQ distance for query vectors vec_id < n_queries (self excluded)."""
    from pyspark.sql import Window as W

    cents = train_codebook(e, iters)
    codes = _assign_codes(_sub_rows(e), _packed(cents)).select(
        "vec_id", "sub", "code"
    )
    # Per-query distance table: n_queries × M × K exact entries.
    dtab = (
        _sub_rows(e.filter(F.col("vec_id") < n_queries))
        .join(F.broadcast(_packed(cents)), "sub")
        .select(
            F.col("vec_id").alias("query_id"),
            "sub",
            F.explode("cents").alias("p"),
            F.col("sv"),
        )
        .select(
            "query_id",
            "sub",
            F.col("p.k").cast("int").alias("code"),
            _sqdist(F.col("sv"), F.col("p.cv")).alias("pd"),
        )
    )
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

    cents = train_codebook(e, iters)
    codes = _assign_codes(_sub_rows(e), _packed(cents)).select(
        "vec_id", "sub", "code"
    )
    dtab = (
        _sub_rows(e.filter(F.col("vec_id") < n_queries))
        .join(F.broadcast(_packed(cents)), "sub")
        .select(
            F.col("vec_id").alias("query_id"),
            "sub",
            F.explode("cents").alias("p"),
            F.col("sv"),
        )
        .select(
            "query_id",
            "sub",
            F.col("p.k").cast("int").alias("code"),
            _sqdist(F.col("sv"), F.col("p.cv")).alias("pd"),
        )
    )
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
