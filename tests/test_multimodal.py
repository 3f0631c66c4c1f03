"""Multimodal plumbing: binary schema, REAL PNG round-trip (encode →
chunk-walk/CRC/inflate/de-filter decode), Arrow batch shape, 1→N
frame expansion with ceil semantics."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.multimodal.blobs import (
    decode_image_meta,
    png_decode,
    png_encode,
    sample_frames,
    with_blob,
    with_png_blob,
)

SF = "/root/testdata/sf0.001"


def test_blob_column_is_binary(spark):
    d = with_blob(load_table(spark, SF, "documents"))
    assert isinstance(d.schema["blob"].dataType, T.BinaryType)


def test_png_codec_roundtrip_local():
    """The codec itself, no Spark: encode → decode recovers dims,
    channels, and the exact pixel bytes for grey and truecolor."""
    for w, h, ch in [(1, 1, 1), (5, 3, 3), (8, 8, 1), (4, 7, 3)]:
        px = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
        blob = png_encode(w, h, ch, px)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        assert png_decode(blob) == (w, h, ch, px)


def test_png_decode_rejects_corruption():
    blob = bytearray(png_encode(3, 3, 1, bytes(range(9))))
    blob[20] ^= 0xFF  # flip a bit inside IHDR → CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + bytes(blob))


def test_png_blobs_are_real_files(spark):
    """Every generated blob is a parseable PNG whose IDAT inflates to
    filter-0 scanlines of the advertised geometry."""
    blobs = with_png_blob(load_table(spark, SF, "documents")).limit(20).collect()
    assert blobs
    for r in blobs:
        w, h, ch, px = png_decode(bytes(r.blob))
        assert len(px) == w * h * ch
        assert 1 <= w <= 8 and 1 <= h <= 8 and ch in (1, 3)


def test_decode_meta_recovers_generation_rule(spark):
    """End-to-end through TWO mapInPandas stages: the decoder (which
    sees only bytes) must report exactly what the generation rule
    implies from the text."""
    docs = load_table(spark, SF, "documents")
    meta = decode_image_meta(docs)
    joined = meta.join(docs, "doc_id").select(
        "doc_id", "width", "height", "channels", "n_pixels", "pixel_sum", "text"
    )
    rows = joined.collect()
    assert len(rows) == docs.count()
    for r in rows[:50]:
        b = r.text.encode("utf-8")
        assert r.width == 1 + b[0] % 8
        assert r.height == 1 + b[-1] % 8
        assert r.channels == (3 if len(b) % 2 == 0 else 1)
        assert r.n_pixels == r.width * r.height
        need = r.width * r.height * r.channels
        cycled = (b * (need // len(b) + 1))[:need]
        assert r.pixel_sum == sum(cycled)


def test_frame_sampling_expansion_ceil(spark):
    """ceil(n/stride) frames — an exact stride multiple must NOT emit
    a frame at offset == n_bytes."""
    frames = sample_frames(load_table(spark, SF, "documents"), stride=100)
    counts = {
        r.doc_id: r.n
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    docs = load_table(spark, SF, "documents")
    chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    assert counts == {k: max(1, (v + 99) // 100) for k, v in chars.items()}
    max_off = frames.groupBy("doc_id").agg(F.max("frame_offset").alias("m"))
    for r in max_off.join(docs.select("doc_id", "n_chars"), "doc_id").collect():
        assert r.m < max(1, r.n_chars) or r.n_chars == 0
