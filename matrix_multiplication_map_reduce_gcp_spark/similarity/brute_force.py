"""Brute-force cosine top-k: the exact baseline every ANN variant is
measured against.

Shape: broadcast the (small) query set against the candidate corpus —
a broadcast-nested-loop the executor computes JVM-side with zip_with/
aggregate folds; top-k per query via window row_number. No shuffle of
the corpus beyond the final tiny top-k aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine_rounded


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank) — exact top-k neighbors
    per query vector, excluding self."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    )
    cos = cosine_rounded(F.col("qv"), F.col("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    return rank_topk(scored, k)


def rank_topk(scored: DataFrame, k: int, score_col: str = "cos_sim") -> DataFrame:
    """(query_id, neighbor_id, <score_col>) → rows with rank ≤ k per
    query (deterministic tiebreak on neighbor id)."""
    w = W.partitionBy("query_id").orderBy(F.desc(score_col), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def blocked_cosine_topk(
    blocked: DataFrame,
    block_col: str,
    query_filter,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k where candidates must share the query's block
    (LSH bucket, IVF cell, ...): equi-join on `block_col` instead of a
    cross-join — the common core of every blocked ANN variant."""
    q = blocked.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("qv"),
        block_col,
    )
    c = blocked.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
        block_col,
    )
    cos = cosine_rounded(F.col("qv"), F.col("cv"))
    scored = (
        q.join(c, block_col)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    return rank_topk(scored, k)
