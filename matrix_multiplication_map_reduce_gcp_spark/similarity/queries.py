"""Registry entries for similarity search: exact brute-force top-k,
LSH bucket histogram, and LSH-restricted ANN top-k — each with a full
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double_array, sql_cosine_rounded
from ..registry import query
from .brute_force import cosine_topk
from .ivf import N_CENTROIDS as IVF_N_CENTROIDS
from .ivf import sql_assign_cells
from . import lsh
from .lsh import sql_probe_buckets
from .lsh import bucketize, sql_bucket_expr
from .quantization import sql_code_rows
from . import kmeans
from .kmeans import sql_lloyd_ctes

N_QUERIES = 5  # query set = vec_id < 5
TOP_K = 10


@query(
    "ann_brute_force_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine_rounded('q.embedding', 'c.embedding')} AS cos_sim
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_brute_force_topk(spark, sf_dir):
    """Exact cosine top-10 for 5 query vectors against the corpus —
    the ANN correctness baseline (broadcast queries, no corpus
    shuffle)."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        e, e.filter(F.col("vec_id") < N_QUERIES), k=TOP_K
    )


@query(
    "embedding_label_centroids",
    oracle="""
    WITH dims AS (
      SELECT label, r.i AS dim,
             embedding[r.i + 1] AS comp
      FROM embeddings, UNNEST(range(0, 64)) AS r(i))
    SELECT label, CAST(dim AS INT) AS dim,
           ROUND(SUM(CAST(comp AS DOUBLE)) / COUNT(*), 6) AS mean_comp
    FROM dims GROUP BY label, dim
    """,
)
def embedding_label_centroids(spark, sf_dir):
    """Per-label centroid vectors (element-wise mean), emitted as
    (label, dim, mean) rows — the vector-aggregation shape of
    clustering/IVF training. Rounded to 6 digits: float sums of ~500
    components differ across engines at the 1e-13 level."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode(as_double_array("embedding")).alias("dim", "comp")
    )
    return comp.groupBy("label", F.col("dim").cast("int").alias("dim")).agg(
        F.round(F.sum("comp") / F.count("*"), 6).alias("mean_comp")
    )


@query(
    "ann_lsh_buckets",
    oracle=f"""
    SELECT {sql_bucket_expr('embedding')} AS bucket, COUNT(*) AS n_vectors
    FROM embeddings
    GROUP BY 1
    """,
)
def ann_lsh_buckets(spark, sf_dir):
    """Sign-random-projection bucket histogram: one narrow pass over
    the corpus; the distribution is what you'd monitor before trusting
    the ANN join at scale."""
    e = load_table(spark, sf_dir, "embeddings")
    return bucketize(e).groupBy("bucket").agg(F.count("*").alias("n_vectors"))


@query(
    "ann_ivf_cells",
    oracle=f"""
    WITH assigned AS ({sql_assign_cells()})
    SELECT cell, COUNT(*) AS n_vectors
    FROM assigned GROUP BY cell
    """,
)
def ann_ivf_cells(spark, sf_dir):
    """IVF cell histogram: corpus partitioned around 16 deterministic
    centroids (broadcast argmin assignment, map-only)."""
    from .ivf import assign_cells

    e = load_table(spark, sf_dir, "embeddings")
    return assign_cells(e).groupBy("cell").agg(F.count("*").alias("n_vectors"))


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH assigned AS ({sql_assign_cells()}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine_rounded('q.embedding', 'c.embedding')} AS cos_sim
      FROM assigned q JOIN assigned c
        ON q.cell = c.cell AND q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-restricted ANN top-10: candidates share the query's cell —
    the data-adaptive counterpart of the LSH bucket join."""
    from .brute_force import blocked_cosine_topk
    from .ivf import assign_cells

    e = assign_cells(load_table(spark, sf_dir, "embeddings"))
    return blocked_cosine_topk(e, "cell", F.col("vec_id") < N_QUERIES, TOP_K)


@query(
    "ann_lsh_multiprobe_topk",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {sql_bucket_expr('embedding')} AS bucket
      FROM embeddings),
    probes AS (
      SELECT vec_id, embedding, UNNEST({sql_probe_buckets('bucket')}) AS probe
      FROM bucketed WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine_rounded('q.embedding', 'c.embedding')} AS cos_sim
      FROM probes q JOIN bucketed c
        ON q.probe = c.bucket AND q.vec_id != c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_lsh_multiprobe_topk(spark, sf_dir):
    """Multi-probe LSH ANN: each query also searches the 8 buckets one
    sign-flip away — ~9× candidates for the same index, recovering the
    near-boundary neighbors single-probe misses (the standard recall
    lever; adding hash tables would cost memory instead)."""
    from .brute_force import rank_topk
    from .lsh import probe_buckets

    e = bucketize(load_table(spark, sf_dir, "embeddings"))
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            as_double_array("embedding").alias("qv"),
            F.explode(probe_buckets(F.col("bucket"))).alias("bucket"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array("embedding").alias("cv"),
        "bucket",
    )
    from ..functions.vectors import cosine_rounded

    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine_rounded(F.col("qv"), F.col("cv")).alias("cos_sim")
        )
        .distinct()
    )
    return rank_topk(scored, TOP_K)


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {sql_bucket_expr('embedding')} AS bucket
      FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine_rounded('q.embedding', 'c.embedding')} AS cos_sim
      FROM bucketed q JOIN bucketed c
        ON q.bucket = c.bucket AND q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """ANN top-10 restricted to the query's LSH bucket: equi-join on
    bucket id replaces the cross-join — the shape that survives 100 TB."""
    from .brute_force import blocked_cosine_topk

    e = bucketize(load_table(spark, sf_dir, "embeddings"))
    return blocked_cosine_topk(e, "bucket", F.col("vec_id") < N_QUERIES, TOP_K)


@query(
    "embedding_sq8_codes",
    oracle=f"""
    WITH codes AS ({sql_code_rows()})
    SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum,
           MIN(code) AS code_min, MAX(code) AS code_max,
           CAST(COUNT(*) AS BIGINT) AS n_dims
    FROM codes GROUP BY vec_id
    """,
)
def embedding_sq8_codes(spark, sf_dir):
    """SQ8 scalar quantization: vectors L2-normalized, one global
    absmax scale trained over the corpus (a single broadcast scalar),
    each vector encoded to signed 8-bit codes — 4-8× memory
    compression for billion-vector indexes. The gate checks per-vector
    code summaries (sum/min/max/count): any divergence in a single
    code moves code_sum. Computed array-native (fold/array_min/
    array_max/size) — map-only, zero shuffles; the oracle's long-form
    GROUP BY produces identical values because every quantity is an
    exact integer."""
    from .quantization import code_arrays

    e = load_table(spark, sf_dir, "embeddings")
    code_sum = F.aggregate(
        "codes", F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return code_arrays(e).select(
        "vec_id",
        code_sum.alias("code_sum"),
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
        F.size("codes").cast("bigint").alias("n_dims"),
    )


@query(
    "ann_sq8_topk",
    oracle=f"""
    WITH codes AS ({sql_code_rows()}),
    prods AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(q.code AS BIGINT) * c.code) AS BIGINT) AS qdot
      FROM codes q JOIN codes c ON q.dim = c.dim AND q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, neighbor_id) AS rank
      FROM prods)
    SELECT query_id, neighbor_id, qdot, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_sq8_topk(spark, sf_dir):
    """ANN top-10 by symmetric-int8 quantized dot product over
    NORMALIZED vectors, scored in ONE map-only Arrow pass (r12,
    quantization.py::sq8_scored_arrow): the bounded query set's raw
    vectors and the one-row scale are collected driver-side, codes
    are re-derived per Arrow batch with the identical IEEE op
    sequence, and all dots are one exact int64 GEMM. The corpus never
    shuffles (the r11 shape additionally re-ran the normalize fold in
    two plan branches and paid an interpreted 64-dim fold per pair);
    at scale this is the cheap first pass whose candidates exact
    float rescoring then reranks (test_quality_gates pins recall vs
    ann_brute_force_topk). The oracle recomputes codes and dots from
    scratch in SQL — the whole normalize→quantize→score→rank
    pipeline is hash-checked."""
    from .brute_force import rank_topk
    from .quantization import sq8_scored_arrow

    e = load_table(spark, sf_dir, "embeddings")
    return rank_topk(sq8_scored_arrow(e, N_QUERIES), TOP_K, score_col="qdot")


@query(
    "kmeans_assignments",
    oracle=f"""
    WITH {sql_lloyd_ctes()}
    SELECT vec_id, k AS cluster, dist
    FROM a{kmeans.ITERATIONS}
    """,
)
def kmeans_assignments(spark, sf_dir):
    """Final Lloyd-round cluster assignment (vec_id, cluster, exact
    squared grid distance) after 2 k-means iterations seeded from
    vectors 0..K-1 — the IVF training loop, bit-reproducible because
    every step is integer arithmetic (see similarity/kmeans.py). The
    corpus is scanned once per iteration and joined against a
    broadcast K*64-row centroid table; nothing large ever shuffles."""
    a, _ = kmeans.lloyd(load_table(spark, sf_dir, "embeddings"))
    return a.select("vec_id", F.col("k").alias("cluster"), "dist")


@query(
    "kmeans_centroids",
    oracle=f"""
    WITH {sql_lloyd_ctes()}
    SELECT k, CAST(dim AS INT) AS dim, c
    FROM c{kmeans.ITERATIONS}
    """,
)
def kmeans_centroids(spark, sf_dir):
    """Trained centroid table (k, dim, c) on the 1e-6 integer grid
    after 2 Lloyd rounds — 512 rows, every component hash-checked.
    Updates are exact floor(mean) divisions, so any partitioning
    schedule produces identical centroids."""
    _, cents = kmeans.lloyd(load_table(spark, sf_dir, "embeddings"))
    return cents.select("k", F.col("dim").cast("int").alias("dim"), "c")


POOL_PER_LABEL = 2  # negative-candidate pool rows per label
NEG_K = 2  # hard negatives kept per anchor


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH pool AS (
      SELECT vec_id, label, embedding FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY label
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings)
      WHERE rn <= {POOL_PER_LABEL}),
    scored AS (
      SELECT a.vec_id AS anchor_id, p.vec_id AS negative_id,
             p.label AS negative_label,
             {sql_cosine_rounded('a.embedding', 'p.embedding')} AS cos_sim
      FROM embeddings a JOIN pool p ON a.label != p.label),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                   ORDER BY cos_sim DESC, negative_id) AS rn
      FROM scored)
    SELECT anchor_id, negative_id, negative_label, cos_sim,
           CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {NEG_K}
    """,
)
def hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for contrastive embedding training: each
    anchor keeps its {NEG_K} most-similar vectors ({POOL_PER_LABEL}
    per label, md5-sampled) drawn from OTHER labels — the highest-
    cosine wrong-label candidates are exactly the 'hard' negatives a
    triplet/InfoNCE loss wants.

    Scale shape: the candidate pool is {POOL_PER_LABEL}·|labels| rows
    (broadcast); the corpus is scanned once, map-side, computing
    |pool| cosines per anchor — no corpus self-join, no shuffle of
    the embedding column. Growing the pool trades broadcast size for
    negative quality; the corpus-side cost stays linear."""
    from pyspark.sql import Window as W
    from ..functions.portable_hash import md5_hex

    e = load_table(spark, sf_dir, "embeddings")
    w = W.partitionBy("label").orderBy(md5_hex(F.col("vec_id")), "vec_id")
    pool = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= POOL_PER_LABEL)
        .select(
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            as_double_array("embedding").alias("neg_vec"),
        )
    )
    anchors = e.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        as_double_array("embedding").alias("anchor_vec"),
    )
    from ..functions.vectors import cosine_rounded

    scored = (
        anchors.join(
            F.broadcast(pool),
            F.col("anchor_label") != F.col("negative_label"),
        )
        .select(
            "anchor_id",
            "negative_id",
            "negative_label",
            cosine_rounded(
                F.col("anchor_vec"), F.col("neg_vec")
            ).alias("cos_sim"),
        )
    )
    wr = W.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), "negative_id")
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= NEG_K)
        .select("anchor_id", "negative_id", "negative_label", "cos_sim", "rank")
    )


# ---- Product quantization (PQ / ADC) --------------------------------------

from . import pq as _pq  # noqa: E402


@query(
    "pq_codes",
    oracle=f"""
    WITH {_pq.sql_pq_ctes()}
    SELECT vec_id, CAST(sub AS INT) AS sub, CAST(code AS INT) AS code
    FROM scode
    """,
)
def pq_codes(spark, sf_dir):
    """PQ index of the corpus: 16x16 codebook trained with 2
    exact-integer Lloyd rounds per subspace, then each vector stored
    as 16 nibble codes (8 bytes/vector — the compression that lets a
    100 TB corpus's ANN index live in cluster RAM). Codes are
    assigned map-only against the broadcast codebook."""
    return _pq.pq_codes(load_table(spark, sf_dir, "embeddings"))


@query(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH {_pq.sql_pq_ctes()},
    dtab AS (
      SELECT q.vec_id AS query_id, q.sub, c.k AS code,
             CAST(SUM((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS pd
      FROM sq q JOIN sc{_pq.PQ_ITERS} c ON q.sub = c.sub AND q.dim = c.dim
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2, 3),
    adc AS (
      SELECT d.query_id, s.vec_id AS neighbor_id,
             CAST(SUM(d.pd) AS BIGINT) AS adc_dist
      FROM scode s JOIN dtab d ON s.sub = d.sub AND s.code = d.code
      WHERE s.vec_id != d.query_id
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, neighbor_id) AS rank
      FROM adc)
    SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_pq_adc_topk(spark, sf_dir):
    """Asymmetric-distance ANN: each query builds a broadcast 16x16
    table of exact subspace distances and every corpus vector is
    scored with 16 table lookups over its PQ codes — the corpus's raw
    vectors never join, never shuffle. Exact bigint distances make
    the ranking (and the oracle hash) deterministic."""
    return _pq.adc_topk(
        load_table(spark, sf_dir, "embeddings"), N_QUERIES, TOP_K
    )


@query(
    "ann_pq_rerank_topk",
    oracle=f"""
    WITH {_pq.sql_pq_ctes()},
    dtab AS (
      SELECT q.vec_id AS query_id, q.sub, c.k AS code,
             CAST(SUM((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS pd
      FROM sq q JOIN sc{_pq.PQ_ITERS} c ON q.sub = c.sub AND q.dim = c.dim
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2, 3),
    adc AS (
      SELECT d.query_id, s.vec_id AS neighbor_id,
             CAST(SUM(d.pd) AS BIGINT) AS adc_dist
      FROM scode s JOIN dtab d ON s.sub = d.sub AND s.code = d.code
      WHERE s.vec_id != d.query_id
      GROUP BY 1, 2),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist, neighbor_id) AS srn
        FROM adc) WHERE srn <= {_pq.SHORTLIST}),
    ex AS (
      SELECT s.query_id, s.neighbor_id,
             CAST(SUM((a.qx - b.qx) * (a.qx - b.qx)) AS BIGINT) AS l2_dist
      FROM short s
      JOIN sq a ON a.vec_id = s.query_id
      JOIN sq b ON b.vec_id = s.neighbor_id
               AND a.sub = b.sub AND a.dim = b.dim
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY l2_dist, neighbor_id) AS rank
      FROM ex)
    SELECT query_id, neighbor_id, l2_dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_pq_rerank_topk(spark, sf_dir):
    """ADC shortlist + exact rerank — the production IVF-PQ search:
    PQ codes prune the corpus to 50 candidates/query (compressed-
    domain scan), then only those 50 get a full-vector exact distance
    and the final top-10 ranking. Recall is set by the shortlist
    width, not the code width."""
    return _pq.adc_rerank_topk(
        load_table(spark, sf_dir, "embeddings"), N_QUERIES, TOP_K
    )


@query(
    "ann_ivfpq_topk",
    oracle=f"""
    WITH {_pq.sql_pq_ctes()},
    cellassign AS ({sql_assign_cells()}),
    cells AS (SELECT vec_id, cell FROM cellassign),
    probe AS (
      SELECT query_id, cell FROM (
        SELECT v.vec_id AS query_id, c.vec_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {sql_cosine_rounded('v.embedding', 'c.embedding')} DESC,
                          c.vec_id) AS rn
        FROM embeddings v CROSS JOIN
             (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id < {IVF_N_CENTROIDS}) c
        WHERE v.vec_id < {N_QUERIES})
      WHERE rn <= {_pq.NPROBE}),
    cand AS (
      SELECT p.query_id, c.vec_id
      FROM cells c JOIN probe p ON c.cell = p.cell),
    dtab AS (
      SELECT q.vec_id AS query_id, q.sub, c.k AS code,
             CAST(SUM((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS pd
      FROM sq q JOIN sc{_pq.PQ_ITERS} c ON q.sub = c.sub AND q.dim = c.dim
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2, 3),
    adc AS (
      SELECT ca.query_id, s.vec_id AS neighbor_id,
             CAST(SUM(d.pd) AS BIGINT) AS adc_dist
      FROM scode s
      JOIN cand ca ON s.vec_id = ca.vec_id
      JOIN dtab d ON d.query_id = ca.query_id
                 AND d.sub = s.sub AND d.code = s.code
      WHERE s.vec_id != ca.query_id
      GROUP BY 1, 2),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist, neighbor_id) AS srn
        FROM adc) WHERE srn <= {_pq.SHORTLIST}),
    ex AS (
      SELECT s.query_id, s.neighbor_id,
             CAST(SUM((a.qx - b.qx) * (a.qx - b.qx)) AS BIGINT) AS l2_dist
      FROM short s
      JOIN sq a ON a.vec_id = s.query_id
      JOIN sq b ON b.vec_id = s.neighbor_id
               AND a.sub = b.sub AND a.dim = b.dim
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY l2_dist, neighbor_id) AS rank
      FROM ex)
    SELECT query_id, neighbor_id, l2_dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_ivfpq_topk(spark, sf_dir):
    """The full IVF-PQ stack in one query: coarse cells prune the
    corpus to 3 probed cells per query, ADC over 8-byte PQ codes
    scores only those candidates, and the shortlist gets an exact
    rerank — the canonical memory-bounded billion-vector ANN
    architecture, with nprobe as the recall/cost knob."""
    return _pq.ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"), N_QUERIES, TOP_K
    )


SEMDEDUP_TAU = 0.3  # within-cluster cosine threshold


@query(
    "semdedup_keep_list",
    oracle=f"""
    WITH {sql_lloyd_ctes(k_sql=kmeans.sql_adaptive_k(), sample_sql=str(kmeans.TRAIN_SAMPLE))},
    cells AS (
      SELECT e.vec_id, a.k AS cell, e.embedding
      FROM embeddings e JOIN a{kmeans.ITERATIONS} a ON e.vec_id = a.vec_id),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM cells a JOIN cells b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {sql_cosine_rounded('a.embedding', 'b.embedding')}
              >= {SEMDEDUP_TAU}),
    labeled AS (
      SELECT c.vec_id, c.cell, d.vec_id IS NOT NULL AS is_dup
      FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id)
    SELECT vec_id, cell, is_dup,
           CASE WHEN is_dup THEN 'drop' ELSE 'keep' END AS verdict
    FROM labeled
    """,
)
def semdedup_keep_list(spark, sf_dir):
    """SemDeDup (Abbas et al., 2023): semantic deduplication that
    exact/MinHash dedup cannot see — paraphrases and re-renderings
    land in the same k-means cell with high embedding cosine even
    when they share no shingles. Cluster the corpus (the 2-round
    integer-exact Lloyd trainer, similarity/kmeans.py), compare pairs
    ONLY within a cell, and drop every vector that has a lower-id
    in-cell neighbor with cosine ≥ τ — the paper's keep-one-per-group
    policy made deterministic by the id order.

    Scale shape: clustering is what makes semantic dedup tractable —
    candidate pairs are Σ|cell|², so the cluster count MUST grow with
    the corpus: K(n) = max(8, n/64) on both engines (the DuckDB seed
    count is the same scalar subquery), keeping the pair volume at
    ~n·64 instead of n²/K. And because flat Lloyd training is
    O(n·K·d) per round, centroids train on the deterministic
    vec_id < 4096 sample (the pq.py posture) with ONE full-corpus
    assignment pass at the end — NumPy integer GEMM for large K
    (kmeans.py::_assign_pandas). The r4 sf1 probe measured the
    fixed-K=8 version at 48× wall for 10× data; with all levers the
    probe runs at 1.7× wall for 10× data. The pair join
    is an equi-join on cell id; the verdict join is a broadcast of
    the dropped-id list. Cosine is the per-pair rounded-exact fold
    (functions/vectors.py), so the oracle hash-checks every
    similarity decision."""
    e = load_table(spark, sf_dir, "embeddings")
    a, _ = kmeans.lloyd(
        e, k=kmeans.adaptive_k(e.count()), sample=kmeans.TRAIN_SAMPLE
    )
    v = as_double_array("embedding")
    # Materialize the assignment once: cells feeds BOTH pair sides and
    # the verdict join, and without the checkpoint each consumer
    # re-executes the full O(n·K·d) Lloyd assignment (measured ~3× the
    # query's cost at the sf1 probe). On a cluster this is a cached/
    # persisted intermediate table.
    cells = (
        e.join(a.select("vec_id", F.col("k").alias("cell")), "vec_id")
        .select("vec_id", "cell", v.alias("vec"))
        .localCheckpoint(eager=True)
    )
    from ..functions.vectors import cosine_rounded_arrow

    lhs = cells.select(
        F.col("cell"), F.col("vec_id").alias("id_a"), F.col("vec").alias("va")
    )
    rhs = cells.select(
        F.col("cell"), F.col("vec_id").alias("id_b"), F.col("vec").alias("vb")
    )
    dropped = (
        lhs.join(rhs, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            cosine_rounded_arrow(F.col("va"), F.col("vb")) >= F.lit(SEMDEDUP_TAU)
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    flagged = cells.join(
        F.broadcast(dropped.withColumn("__d", F.lit(True))), "vec_id", "left"
    )
    is_dup = F.coalesce(F.col("__d"), F.lit(False))
    return flagged.select(
        "vec_id",
        "cell",
        is_dup.alias("is_dup"),
        F.when(is_dup, "drop").otherwise("keep").alias("verdict"),
    )


KNN_GRAPH_K = 5


@query(
    "knn_graph_lsh",
    oracle=f"""
    WITH p AS (SELECT {lsh.sql_adaptive_planes()} AS planes),
    bucketed AS (
      SELECT vec_id, embedding,
             {sql_bucket_expr('embedding', n_planes=lsh.N_PLANES_MAX)}
               & ((1 << (SELECT planes FROM p)) - 1) AS bucket
      FROM embeddings),
    probes AS (
      SELECT vec_id, embedding,
             CASE WHEN r.i = 0 THEN bucket
                  ELSE xor(bucket, 1 << (r.i - 1)) END AS probe
      FROM bucketed, UNNEST(range(0, {lsh.N_PLANES_MAX + 1})) AS r(i)
      WHERE r.i = 0 OR r.i - 1 < (SELECT planes FROM p)),
    scored AS (
      SELECT DISTINCT q.vec_id AS src, c.vec_id AS dst,
             {sql_cosine_rounded('q.embedding', 'c.embedding')} AS cos_sim
      FROM probes q JOIN bucketed c
        ON q.probe = c.bucket AND q.vec_id != c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                   ORDER BY cos_sim DESC, dst) AS rank
      FROM scored)
    SELECT src, dst, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {KNN_GRAPH_K}
    """,
)
def knn_graph_lsh(spark, sf_dir):
    """Approximate k-NN GRAPH construction — every vector's top-5
    neighbors, not just a query set's. The kNN graph is the substrate
    for graph-based ANN serving (NN-Descent/HNSW build their layers
    from exactly this) and for graph clustering over embeddings; at
    corpus scale the only viable construction is candidate generation
    by bucketing, and this one reuses the multi-probe SRP-LSH index:
    every vector probes its own bucket plus the per-plane one-bit-flip
    neighbors, then an exact rounded cosine ranks the candidates per
    source.

    The plane count is CORPUS-ADAPTIVE (lsh.adaptive_planes): the sf1
    probe measured 11.6× wall at 10× data with planes fixed at 8 —
    self-join candidate volume grows as (planes+1)n²/2^planes, so
    2^planes scales ∝ n/KNN_TARGET_BUCKET, holding expected bucket
    occupancy (and per-vector candidates) constant. Plane p is bucket
    bit p, so the oracle mirrors adaptivity exactly: it computes the
    fixed 16-plane signature and masks to the low `planes` bits
    (identical to computing only `planes` dots, as Spark does).

    Shuffle story: one narrow bucketing pass (map-only fold-dots),
    one equi-join on bucket id, one per-src top-k window — identical
    plan at 10⁹ vectors; per-vector recall is the multi-probe recall
    pinned for the query-set variant; graph edges hash-checked
    exactly."""
    return knn_graph(load_table(spark, sf_dir, "embeddings"))


def knn_graph(corpus, k: int = KNN_GRAPH_K):
    """Core kNN-graph pipeline over (vec_id, embedding) — split from
    the registry entry so quality gates can feed planted clustered
    corpora (tests/test_quality_gates.py pins the recall floor there;
    the fixture's random embeddings have no neighbor structure to
    recall).

    Plane count adapts to the corpus (lsh.adaptive_planes); the count
    to size it is one cheap narrow job — the same count any adaptive
    partitioner pays. Spark computes only the `planes` dots it uses
    (bits 0..planes-1 == the oracle's masked 16-plane signature)."""
    from .lsh import adaptive_planes, bucket_arrow, probe_buckets

    planes = adaptive_planes(corpus.count())
    e = corpus.withColumn(
        "bucket", bucket_arrow(as_double_array("embedding"), n_planes=planes)
    )
    # Probe/join/dedup on IDS ONLY (the embedding_near_dup_pairs
    # discipline): the 512-byte vectors never ride the 9× probe
    # explode, the bucket join, or the distinct shuffle — they join
    # back exactly once per SURVIVING candidate pair.
    q = e.select(
        F.col("vec_id").alias("src"),
        F.explode(probe_buckets(F.col("bucket"), n_planes=planes)).alias("bucket"),
    )
    c = e.select(F.col("vec_id").alias("dst"), "bucket")
    cand = (
        q.join(c, "bucket")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    from ..functions.vectors import cosine_rounded_arrow

    va = e.select(F.col("vec_id").alias("src"), as_double_array("embedding").alias("qv"))
    vb = e.select(F.col("vec_id").alias("dst"), as_double_array("embedding").alias("cv"))
    scored = (
        cand.join(va, "src")
        .join(vb, "dst")
        .select(
            "src",
            "dst",
            cosine_rounded_arrow(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


PROTO_DROP_PCTILE = 0.9  # drop the farthest 10% per cell


@query(
    "embedding_prototypicality",
    oracle=f"""
    WITH {sql_lloyd_ctes()},
    ranked AS (
      SELECT vec_id, k AS cell, dist,
             PERCENT_RANK() OVER (PARTITION BY k
                                  ORDER BY dist, vec_id) AS dist_pctile
      FROM a{kmeans.ITERATIONS})
    SELECT vec_id, cell, dist, dist_pctile,
           CASE WHEN dist_pctile >= {PROTO_DROP_PCTILE}
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM ranked
    """,
)
def embedding_prototypicality(spark, sf_dir):
    """Prototypicality pruning (Sorscher et al., NeurIPS 2022 — 'Beyond
    neural scaling laws'): rank every vector by its distance to its
    k-means centroid and drop the farthest tail per cluster — the
    embedding-space outliers that are disproportionately noise,
    OCR garbage, or off-distribution scraps. The keep/drop percentile
    is the data-pruning knob the paper sweeps.

    Cost on top of clustering: ZERO extra passes — the exact integer
    squared distance is already the by-product of the Lloyd
    assignment (kmeans.py); ranking is one percent_rank window per
    cell (two integers per row → bit-identical doubles). Cells are
    size-bounded by K, so no window partition outgrows an
    executor."""
    from pyspark.sql import Window as W

    a, _ = kmeans.lloyd(load_table(spark, sf_dir, "embeddings"))
    w = W.partitionBy("k").orderBy("dist", "vec_id")
    pct = F.percent_rank().over(w)
    return a.select(
        "vec_id",
        F.col("k").alias("cell"),
        "dist",
        pct.alias("dist_pctile"),
        F.when(pct >= PROTO_DROP_PCTILE, "drop").otherwise("keep").alias("verdict"),
    )


@query(
    "ann_recall_report",
    oracle=f"""
    WITH exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_cosine_rounded('q.embedding', 'c.embedding')} DESC,
                          c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES})
      WHERE rank <= {TOP_K}),
    bucketed AS (
      SELECT vec_id, embedding, {sql_bucket_expr('embedding')} AS bucket
      FROM embeddings),
    probes AS (
      SELECT vec_id, embedding, UNNEST({sql_probe_buckets('bucket')}) AS probe
      FROM bucketed WHERE vec_id < {N_QUERIES}),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {sql_cosine_rounded('q.embedding', 'c.embedding')} AS cos_sim
          FROM probes q JOIN bucketed c
            ON q.probe = c.bucket AND q.vec_id != c.vec_id))
      WHERE rank <= {TOP_K})
    SELECT e.query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*) AS recall_at_k
    FROM exact e LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """,
)
def ann_recall_report(spark, sf_dir):
    """In-engine ANN quality evaluation: per-query recall@10 of the
    multi-probe LSH index against the exact brute-force ranking — the
    report an index deployment monitors when it tunes planes/probes.
    Recall evaluation at scale is itself a join problem: exact top-k
    (ground truth on a sampled query set) LEFT-joins the approx
    top-k on (query, neighbor), and the hit rate is COUNT(match)/k —
    never a per-query collect. The sampled query set bounds the
    brute-force side; the approx side is the production index path.
    The per-query floats are integer-ratio divisions, hash-exact."""
    from .brute_force import rank_topk
    from .lsh import probe_buckets
    from ..functions.vectors import cosine_rounded

    e = load_table(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")
    qset = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), v.alias("qv")
    )
    corpus = e.select(F.col("vec_id").alias("neighbor_id"), v.alias("cv"))
    exact_scored = (
        # Explicit broadcast of the bounded query set (N_QUERIES rows)
        # — the corpus side must NEVER shuffle for the exact oracle,
        # and relying on AQE to pick the broadcast is fragile at 100×
        # (a fat row-size estimate can flip it to a shuffled
        # nested-loop). Matches ann_brute_force_topk's shape; pinned
        # in tests/test_plans.py::test_ann_recall_report_broadcasts_queries.
        F.broadcast(qset).crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_rounded(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    exact = rank_topk(exact_scored, TOP_K).select("query_id", "neighbor_id")
    b = bucketize(e)
    probes = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        v.alias("qv"),
        F.explode(probe_buckets(F.col("bucket"))).alias("bucket"),
    )
    cands = b.select(F.col("vec_id").alias("neighbor_id"), v.alias("cv"), "bucket")
    approx_scored = (
        probes.join(cands, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_rounded(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
        .distinct()
    )
    approx = rank_topk(approx_scored, TOP_K).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.hit_id),
        "left",
    ).select(exact.query_id.alias("qid"), "neighbor_id", "hit_id")
    return joined.groupBy(F.col("qid").alias("query_id")).agg(
        F.count("hit_id").alias("n_hits"),
        F.count("*").alias("k"),
        (F.count("hit_id").cast("double") / F.count("*")).alias("recall_at_k"),
    )


MRL_DIM = 16  # Matryoshka prefix: first 16 of the 64 dims


@query(
    "mrl_truncation_recall",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine_rounded('q.embedding', 'c.embedding')} AS cos_full,
             {sql_cosine_rounded(f'(q.embedding[1:{MRL_DIM}])',
                                 f'(c.embedding[1:{MRL_DIM}])')} AS cos_pre
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
      SELECT query_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS r_full,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_pre DESC, neighbor_id) AS r_pre
      FROM scored)
    SELECT query_id,
           CAST({MRL_DIM} AS INT) AS prefix_dim,
           CAST(SUM(CASE WHEN r_full <= {TOP_K} AND r_pre <= {TOP_K}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN r_full <= {TOP_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS k,
           CAST(CAST(SUM(CASE WHEN r_full <= {TOP_K} AND r_pre <= {TOP_K}
                              THEN 1 ELSE 0 END) AS STRING) AS DOUBLE)
             / SUM(CASE WHEN r_full <= {TOP_K} THEN 1 ELSE 0 END)
             AS recall_at_k
    FROM ranked GROUP BY query_id
    """,
)
def mrl_truncation_recall(spark, sf_dir):
    """Matryoshka truncation quality report (MRL — Kusupati et al.,
    2022): per-query recall@10 of the PREFIX-dimension cosine ranking
    (first 16 of 64 dims) against the full-dimension ranking — the
    report that tunes how far an embedding column can be truncated
    before the cheap first-pass shortlist stops recovering the true
    neighbors. The production pattern it certifies is
    shortlist-by-prefix + rerank-by-full (the PQ/ADC shape with
    dimension slicing instead of codebooks): prefix dims cost 4× less
    memory bandwidth and FLOPs per candidate here.

    Scale shape: ONE broadcast crossJoin scores BOTH similarities per
    pair (the corpus never shuffles and is scanned once — unlike
    scoring full and prefix in separate passes), then both
    ROW_NUMBERs share the same query_id window partition, so the
    bounded query set's candidates shuffle once. Cosines are the
    rounded-exact fold (functions/vectors.py) on both engines, so the
    oracle hash-checks every ranking decision; recall doubles are
    small-integer ratios, bit-identical cross-engine."""
    from pyspark.sql import Window as W

    from ..functions.vectors import cosine_rounded

    e = load_table(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")
    qset = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), v.alias("qv")
    )
    corpus = e.select(F.col("vec_id").alias("neighbor_id"), v.alias("cv"))
    scored = (
        F.broadcast(qset)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_rounded(F.col("qv"), F.col("cv")).alias("cos_full"),
            cosine_rounded(
                F.slice(F.col("qv"), 1, MRL_DIM),
                F.slice(F.col("cv"), 1, MRL_DIM),
            ).alias("cos_pre"),
        )
    )
    w_full = W.partitionBy("query_id").orderBy(
        F.desc("cos_full"), F.asc("neighbor_id")
    )
    w_pre = W.partitionBy("query_id").orderBy(
        F.desc("cos_pre"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        F.row_number().over(w_full).alias("r_full"),
        F.row_number().over(w_pre).alias("r_pre"),
    )
    hit = F.sum(
        F.when((F.col("r_full") <= TOP_K) & (F.col("r_pre") <= TOP_K), 1)
        .otherwise(0)
    )
    k = F.sum(F.when(F.col("r_full") <= TOP_K, 1).otherwise(0))
    return ranked.groupBy("query_id").agg(
        hit.cast("long").alias("n_hits"),
        k.cast("long").alias("k"),
        (hit.cast("double") / k).alias("recall_at_k"),
    ).withColumn("prefix_dim", F.lit(MRL_DIM).cast("int"))
