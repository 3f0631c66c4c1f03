"""IVF (inverted-file) ANN: partition the corpus into cells around
fixed centroids; search only the query's cell.

Centroids here are a deterministic seed subset of the corpus
(vec_id < n_centroids) rather than k-means-trained — the partition/
probe mechanics are identical, and determinism keeps the operator
oracle-checkable. Swapping in trained centroids is a drop-in (they'd
be just another small broadcast table).

Scale shape: assignment is one broadcast join + argmin over
n_centroids fold-dots (map-only); the ANN search becomes an equi-join
on cell id — same candidate-reduction story as LSH, but with
data-adaptive cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine_rounded

N_CENTROIDS = 16


def assign_cells(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """corpus + `cell` column: id of the nearest centroid by rounded
    cosine (tiebreak on centroid id)."""
    centroids = F.broadcast(
        corpus.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("centroid_id"),
            as_double_array(vec_col).alias("cv"),
        )
    )
    v = corpus.select("*", as_double_array(vec_col).alias("__v"))
    scored = v.join(centroids, how="cross").select(
        "*", cosine_rounded(F.col("__v"), F.col("cv")).alias("__cos")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("__cos"), "centroid_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*corpus.columns, F.col("centroid_id").alias("cell"))
    )


def sql_assign_cells(n_centroids: int = N_CENTROIDS) -> str:
    """DuckDB mirror of :func:`assign_cells` over `embeddings`."""
    return f"""
    SELECT vec_id, embedding, label, cell FROM (
      SELECT v.*, c.vec_id AS cell,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY ROUND(
                 list_dot_product(v.embedding::DOUBLE[], c.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) DESC,
               c.vec_id) AS rn
      FROM embeddings v CROSS JOIN
           (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n_centroids}) c)
    WHERE rn = 1
    """
