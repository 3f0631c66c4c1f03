"""Text → vector featurization with the hashing trick: tokens hash
into a fixed-dim space (portable hash), counts become weights, L2
normalized. The bridge from the text pipeline into the similarity
stack — at 100 TB this is the cheap featurizer you run before any
model-based embedding (one explode + one groupBy; no vocabulary
build, no driver state).

Output is (doc_id, dim, weight) rows rather than array columns so the
oracle comparison stays scalar; `embedding_label_centroids` shows the
same row-form convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable_hash import hash32, sql_hash32
from ..registry import query

DIM = 32


def hash_embed(docs: DataFrame, dim: int = DIM) -> DataFrame:
    """(doc_id, dim, weight): tf counts hashed into `dim` buckets,
    then L2-normalized per doc (exact integer counts; the norm divide
    is the only float op, rounded for cross-engine stability)."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    bucket = (hash32(F.col("tok")) % dim).alias("dim")
    counts = tok.groupBy("doc_id", bucket).agg(F.count("*").alias("tf"))
    norms = counts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("norm")
    )
    return (
        counts.join(norms, "doc_id")
        .select(
            "doc_id",
            "dim",
            F.round(F.col("tf") / F.col("norm"), 6).alias("weight"),
        )
    )


@query(
    "text_hash_embeddings",
    oracle=f"""
    WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    counts AS (
      SELECT doc_id, ({sql_hash32('tok')}) % {DIM} AS dim, COUNT(*) AS tf
      FROM tok GROUP BY 1, 2),
    norms AS (SELECT doc_id, sqrt(SUM(tf * tf)) AS norm FROM counts GROUP BY 1)
    SELECT c.doc_id, c.dim, ROUND(c.tf / n.norm, 6) AS weight
    FROM counts c JOIN norms n ON c.doc_id = n.doc_id
    """,
)
def text_hash_embeddings(spark, sf_dir):
    """Hashing-trick document vectors (32-dim, portable hash, L2
    normalized) — the text→similarity bridge."""
    return hash_embed(load_table(spark, sf_dir, "documents"))
