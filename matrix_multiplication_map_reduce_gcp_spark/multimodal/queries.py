"""Registry entries for the multimodal plumbing. The decode is a
deterministic stub (see blobs.py) so even these get DuckDB oracles —
the oracle recomputes the fake metadata from the text bytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .blobs import decode_image_meta, sample_frames


@query(
    "multimodal_image_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           64 + ascii(substr(text, 1, 1)) AS width,
           64 + ascii(substr(text, length(text), 1)) AS height,
           3 AS channels
    FROM documents
    """,
)
def multimodal_image_meta(spark, sf_dir):
    """Binary decode plumbing: blob → (n_bytes, width, height,
    channels) through Arrow-batched mapInPandas."""
    d = load_table(spark, sf_dir, "documents")
    out = decode_image_meta(d)
    return out.select(
        "doc_id",
        "n_bytes",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(r.i AS BIGINT) AS frame_idx,
           CAST(r.i AS BIGINT) * 1000 AS frame_offset
    FROM documents, UNNEST(range(0, octet_length(encode(text)) // 1000 + 1)) AS r(i)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video-style 1→N frame sampling through mapInPandas."""
    d = load_table(spark, sf_dir, "documents")
    out = sample_frames(d)
    return out.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_offset",
    )
