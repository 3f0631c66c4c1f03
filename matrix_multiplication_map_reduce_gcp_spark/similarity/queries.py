"""Registry entries for similarity search: exact brute-force top-k,
LSH bucket histogram, and LSH-restricted ANN top-k — each with a full
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double_array, cosine_rounded, sql_cosine_rounded
from ..registry import query
from .brute_force import cosine_topk
from .lsh import bucketize, sql_bucket_expr

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
    e = bucketize(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("qv"),
        "bucket",
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array("embedding").alias("cv"),
        "bucket",
    )
    cos = cosine_rounded(F.col("qv"), F.col("cv"))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )
