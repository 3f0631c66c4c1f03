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
    "multimodal_audio_windows",
    oracle="""
    WITH bytes AS (
      SELECT doc_id,
             r.i // 256 AS window_idx,
             ascii(substr(text, CAST(r.i + 1 AS INT), 1)) AS b
      FROM documents, UNNEST(range(0, octet_length(encode(text)))) AS r(i))
    SELECT doc_id, CAST(window_idx AS INT) AS window_idx,
           CAST(SUM(b) AS DOUBLE) / COUNT(*) AS mean_amplitude,
           MAX(b) AS peak_amplitude
    FROM bytes
    GROUP BY doc_id, window_idx
    """,
)
def multimodal_audio_windows(spark, sf_dir):
    """Audio-style windowed feature extraction (256-byte windows →
    mean/peak 'amplitude') through Arrow-batched mapInPandas — the
    third modality of the binary-column plumbing (the corpus is ASCII,
    so the byte-level oracle mirrors via ascii(substr))."""
    d = load_table(spark, sf_dir, "documents")
    from .blobs import audio_window_features

    out = audio_window_features(d)
    return out.select(
        "doc_id",
        "window_idx",
        "mean_amplitude",
        F.col("peak_amplitude").cast("long").alias("peak_amplitude"),
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
