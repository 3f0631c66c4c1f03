"""Multimodal plumbing: binary schema, Arrow batch shape, 1→N frame
expansion, decode-stub determinism."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.multimodal.blobs import (
    decode_image_meta,
    sample_frames,
    with_blob,
)

SF = "/root/testdata/sf0.001"


def test_blob_column_is_binary(spark):
    d = with_blob(load_table(spark, SF, "documents"))
    assert isinstance(d.schema["blob"].dataType, T.BinaryType)


def test_decode_meta_matches_text_bytes(spark):
    docs = load_table(spark, SF, "documents")
    meta = decode_image_meta(docs)
    joined = meta.join(docs, "doc_id").select(
        "doc_id", "n_bytes", "width", "height", "channels", "n_chars"
    )
    rows = joined.collect()
    assert len(rows) == docs.count()
    for r in rows[:50]:
        # ascii corpus: byte length == char length
        assert r.n_bytes == r.n_chars
        assert 64 <= r.width < 64 + 256 and 64 <= r.height < 64 + 256
        assert r.channels == 3


def test_frame_sampling_expansion(spark):
    docs = load_table(spark, SF, "documents")
    frames = sample_frames(docs, stride=100)
    counts = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    assert counts == {k: v // 100 + 1 for k, v in chars.items()}
