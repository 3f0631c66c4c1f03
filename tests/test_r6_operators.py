"""Round-6 operator pins: RAG chunking manifest + chunk-level dedup.

The chunk-window enumeration is the contract: both engines must emit
IDENTICAL windows at every length boundary, so the integer chunk-count
formula is pinned here against a hand-computed table, and the manifest
invariants (coverage, overlap, hash join-key) are asserted on a
synthetic corpus where expected values are computable by eye.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.text.curation import (
    RAG_CHUNK,
    RAG_STRIDE,
    _chunks,
)


def _mk_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "docs")
    df.write.mode("overwrite").parquet(out + "/documents.parquet")
    return out


def test_chunk_count_boundaries(spark, tmp_path):
    """ceil((n-256)/192)+1 chunks, computed in pure bigint arithmetic:
    pin the exact count at the off-by-one-prone lengths."""
    cases = {
        0: 1,          # empty doc: one empty chunk
        1: 1,
        RAG_CHUNK - 1: 1,
        RAG_CHUNK: 1,          # exactly one window
        RAG_CHUNK + 1: 2,      # one char spills into a second window
        RAG_CHUNK + RAG_STRIDE: 2,      # second window exactly full
        RAG_CHUNK + RAG_STRIDE + 1: 3,
        1000: 1 + (1000 - RAG_CHUNK + RAG_STRIDE - 1) // RAG_STRIDE,
    }
    texts = ["x" * n for n in cases]
    sf = _mk_docs(spark, tmp_path, texts)
    got = {
        r.n: r.c
        for r in _chunks(spark, sf)
        .groupBy(F.col("doc_id"))
        .agg(F.count("*").alias("c"))
        .join(
            spark.read.parquet(sf + "/documents.parquet").select(
                "doc_id", F.col("n_chars").alias("n")
            ),
            "doc_id",
        )
        .select("n", "c")
        .collect()
    }
    assert got == cases


def test_chunk_manifest_coverage_and_overlap(spark, tmp_path):
    """Every character position is covered; consecutive chunks overlap
    by exactly chunk-stride chars; md5 matches hashlib on the window."""
    text = "".join(chr(97 + (i * 7) % 26) for i in range(1000))
    sf = _mk_docs(spark, tmp_path, [text])
    rows = sorted(
        _chunks(spark, sf).collect(), key=lambda r: r.chunk_idx
    )
    covered_to = 0
    for r in rows:
        start0 = r.chunk_start - 1  # manifest is 1-based
        assert start0 <= covered_to, "gap in coverage"
        window = text[start0 : start0 + RAG_CHUNK]
        assert r.chunk_len == len(window)
        assert r.chunk_md5 == hashlib.md5(window.encode()).hexdigest()
        covered_to = max(covered_to, start0 + r.chunk_len)
    assert covered_to == len(text)
    starts = [r.chunk_start for r in rows]
    assert all(b - a == RAG_STRIDE for a, b in zip(starts, starts[1:]))


def test_chunk_dedup_counts_cross_doc_duplicates(spark, tmp_path):
    """Two identical docs: every chunk instance of both is a
    corpus-wide duplicate; a unique third doc contributes none."""
    from matrix_multiplication_map_reduce_gcp_spark import registry

    dup = "abc " * 200        # 800 chars -> 4 chunks (periodic!)
    # uniq must be APERIODIC: a periodic text's own interior windows
    # repeat at stride offsets that agree mod the period, making
    # within-doc self-duplicates (real boilerplate behaves this way —
    # pinned for dup below via distinct < total).
    uniq = "".join(chr(97 + (i * i * 11 + i) % 26) for i in range(800))
    sf = _mk_docs(spark, tmp_path, [dup, dup, uniq])
    qs = registry.load_all()
    rows = {r.source: r for r in qs["chunk_dedup_stats"].fn(spark, sf).collect()}
    # doc 0 -> src0, doc 1 -> src1 (identical text), doc 2 -> src2
    assert rows["src0"].duplicated_chunks == rows["src0"].total_chunks
    assert rows["src1"].duplicated_chunks == rows["src1"].total_chunks
    assert rows["src2"].duplicated_chunks == 0
    assert rows["src2"].distinct_chunks == rows["src2"].total_chunks
    # the periodic dup text's interior windows repeat WITHIN one doc
    # (stride 192 ≡ 0 mod the 4-char period), so distinct < total
    assert rows["src0"].distinct_chunks < rows["src0"].total_chunks


def test_chunk_manifest_is_map_only(spark):
    """The manifest plan must contain no shuffle: sequence/explode/
    substring/md5 are all map-side (the 100 TB scan-bandwidth claim)."""
    from matrix_multiplication_map_reduce_gcp_spark import registry
    from matrix_multiplication_map_reduce_gcp_spark.plans import executed_plan

    qs = registry.load_all()
    plan = executed_plan(
        qs["rag_chunk_manifest"].fn(spark, "/root/testdata/sf0.001")
    )
    assert "Exchange" not in plan, plan


def test_sn_neighbors_bounds_and_locality(spark):
    """The shared sorted-neighborhood helper must (1) emit at most
    `width` candidates per row, (2) never pair across blocks, and
    (3) pair each row with exactly its next-`width` sort successors
    inside its block — the contract all three windowed-blocking
    queries rely on."""
    from matrix_multiplication_map_reduce_gcp_spark.dedup.queries import _sn_neighbors

    rows = [
        (blk, i, (i * 13 + ord(blk)) % 7)
        for blk in ("x", "y")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "blk string, rid long, key long")
    got = _sn_neighbors(
        df,
        part_cols=("blk",),
        order_cols=("key", "rid"),
        width=3,
        lead_cols=("rid",),
        keep_cols=("blk", "rid"),
    ).collect()
    per_row = {}
    for r in got:
        per_row.setdefault((r.blk, r.rid), []).append(r.p.rid)
    assert all(len(v) <= 3 for v in per_row.values())
    # Recompute expected successors per block in (key, rid) order.
    for blk in ("x", "y"):
        order = sorted(
            [(k, i) for (b, i, k) in rows if b == blk]
        )
        ids = [i for _, i in order]
        for pos, rid in enumerate(ids):
            expect = ids[pos + 1 : pos + 4]
            assert sorted(per_row.get((blk, rid), [])) == sorted(expect)


def test_zorder_buckets_bound_both_spans(spark):
    """The property the Morton layout exists for: every z-order bucket
    covers a bounded cell of the (customer, day) grid — BOTH spans
    <= 64 of 256 (a 1024-code Morton range is a 32x32 cell; partial
    buckets can only shrink it, bucket-boundary straddles at most
    double it) — while the date-sorted layout keeps day_span tiny but
    lets cust_span blow up to ~the full key range on populated
    buckets. Also pins the Morton bit layout itself on hand values:
    interleave(k1=0b11, k2=0b01) = 0b1011 = 11."""
    from matrix_multiplication_map_reduce_gcp_spark import registry
    from matrix_multiplication_map_reduce_gcp_spark.operators.analytics import (
        _MORTON_SQL,
    )
    import duckdb

    assert (
        duckdb.sql(
            f"SELECT {_MORTON_SQL.format(k1='3', k2='1')}"
        ).fetchone()[0]
        == 11
    )

    from .conftest import SF_CORRECTNESS

    rows = (
        registry.load_all()["zorder_layout_plan"]
        .fn(spark, SF_CORRECTNESS)
        .collect()
    )
    z = [r for r in rows if r.layout == "zorder"]
    d = [r for r in rows if r.layout == "datesort"]
    assert z and d
    for r in z:
        assert 0 <= r.bucket < 64
        assert r.cust_span <= 64 and r.day_span <= 64, r
    assert all(r.day_span <= 8 for r in d)  # 4-code buckets, straddle x2
    # single-column sort sacrifices the other dimension:
    assert max(r.cust_span for r in d) > 128
    # both layouts partition the same rows
    assert sum(r.n_rows for r in z) == sum(r.n_rows for r in d)
