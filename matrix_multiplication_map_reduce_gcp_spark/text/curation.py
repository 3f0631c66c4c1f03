"""Corpus-curation operators: DSIR-style importance weighting and
cross-source quality-score calibration.

Both are selection policies for assembling an LLM pretraining mix —
the step between raw-corpus quality signals (text/queries.py) and the
mixture/sampling plans (text/queries.py domain_mixture_plan): decide
HOW MUCH each document looks like the data you want, comparably
across heterogeneous sources.

Exactness discipline: every per-document number that crosses a row
boundary is an integer (nano-nat log terms, rank counts); floats
appear only in per-row final projections computed by an identical
IEEE expression in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable_hash import (
    hash32_unsalted,
    hex_slice,
    sql_hash32_unsalted,
    sql_hex_slice,
)
from ..registry import query
from .analysis import tokens

# Hashed-feature model geometry. The DSIR paper uses 10^4 hashed
# n-gram buckets; 128 keeps every bucket populated at the fixture's
# corpus size while exercising the identical pipeline shape.
DSIR_BUCKETS = 128
# The "target" (wanted-distribution) slice: a curated-source proxy —
# in production this is e.g. Wikipedia vs the raw Common Crawl.
DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
      SELECT d.doc_id, d.source,
             {sql_hash32_unsalted("t.tok")} % {DSIR_BUCKETS} AS bucket
      FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(tok)),
    model AS (
      SELECT bucket,
             COUNT(*) FILTER (WHERE source IN {DSIR_TARGET_SOURCES}) AS ct,
             COUNT(*) AS cr
      FROM tok GROUP BY bucket),
    totals AS (
      SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM model),
    ratios AS (
      SELECT m.bucket,
             CAST(ROUND(LN((CAST(m.ct AS DOUBLE) + 1.0)
                           / (CAST(t.nt AS DOUBLE) + {DSIR_BUCKETS}.0)) * 1e9)
                  AS BIGINT)
             - CAST(ROUND(LN((CAST(m.cr AS DOUBLE) + 1.0)
                             / (CAST(t.nr AS DOUBLE) + {DSIR_BUCKETS}.0)) * 1e9)
                    AS BIGINT) AS diff_nano
      FROM model m CROSS JOIN totals t)
    SELECT k.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(r.diff_nano) AS BIGINT) AS logweight_nano,
           (CAST(CAST(SUM(r.diff_nano) AS STRING) AS DOUBLE) / COUNT(*)) / 1e9
             AS avg_logratio,
           CASE WHEN SUM(r.diff_nano) >= 0 THEN 'keep' ELSE 'drop' END
             AS verdict
    FROM tok k JOIN ratios r ON k.bucket = r.bucket
    GROUP BY k.doc_id
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023): score every raw document by how much more likely its hashed
    unigram features are under the TARGET distribution (a curated
    source slice) than under the RAW corpus distribution —
    log w(x) = Σ_tokens [ln p_target(b(tok)) − ln p_raw(b(tok))]
    with Laplace-smoothed bucket probabilities over B=128 hashed
    buckets. Positive log-weight ⇒ the doc looks target-like and is
    kept (the deterministic thresholded variant of DSIR's importance
    resampling).

    Scale shape (the reason DSIR beats classifier filtering at 100 TB):
    the "model" is a B-row table built by ONE map-side-combinable
    count over the token stream, then rides as a broadcast join onto
    the scoring pass — two linear scans of the corpus, no per-doc
    Python, no model server. Exactness: each bucket's two ln() terms
    round to integer nano-nats once (identical IEEE scalar ops on
    identical integer inputs in both engines); only integers sum
    across rows; the keep/drop verdict compares integers."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(tokens()).alias("tok")
    ).select(
        "doc_id",
        "source",
        (hash32_unsalted(F.col("tok")) % DSIR_BUCKETS).alias("bucket"),
    )
    model = tok.groupBy("bucket").agg(
        F.count(F.when(F.col("source").isin(*DSIR_TARGET_SOURCES), 1)).alias("ct"),
        F.count("*").alias("cr"),
    )
    totals = model.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    b = F.lit(float(DSIR_BUCKETS))
    nano = lambda c, n: F.round(  # noqa: E731
        F.log((c.cast("double") + F.lit(1.0)) / (n.cast("double") + b)) * F.lit(1e9)
    ).cast("bigint")
    ratios = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (nano(F.col("ct"), F.col("nt")) - nano(F.col("cr"), F.col("nr"))).alias(
            "diff_nano"
        ),
    )
    return (
        tok.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("diff_nano").alias("logweight_nano"),
            (
                (F.sum("diff_nano").cast("double") / F.count("*")) / F.lit(1e9)
            ).alias("avg_logratio"),
            F.when(F.sum("diff_nano") >= 0, "keep")
            .otherwise("drop")
            .alias("verdict"),
        )
    )


@query(
    "quality_percentile_calibration",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents),
    scored AS (
      SELECT doc_id, source,
             0.6 * (CAST(n_distinct AS DOUBLE) / n_tokens)
               + 0.4 * (CAST(LEAST(n_tokens, 100) AS DOUBLE) / 100) AS quality
      FROM s)
    SELECT doc_id, source, quality,
           PERCENT_RANK() OVER (PARTITION BY source
                                ORDER BY quality, doc_id) AS source_pctile,
           CASE WHEN PERCENT_RANK() OVER (PARTITION BY source
                                          ORDER BY quality, doc_id) >= 0.5
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM scored
    """,
)
def quality_percentile_calibration(spark, sf_dir):
    """Cross-source quality calibration: a raw quality score is not
    comparable across sources (a mediocre wiki page outscores a good
    forum post), so production filters threshold on the WITHIN-SOURCE
    percentile instead — keep each source's top half, preserving
    source diversity that one global cutoff would destroy.

    percent_rank is (rank−1)/(n−1) — two integers per row, so the
    double is bit-identical in both engines; (quality, doc_id) makes
    the sort total and tie-stable. Scale: one window shuffle keyed by
    source; skewed mega-sources are the known caveat and would take
    the two-pass rank (per-partition counts + broadcast offsets) —
    here the window is the honest single-pass shape."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens()
    n_tok = F.size(t)
    n_dis = F.size(F.array_distinct(t))
    quality = (
        F.lit(0.6) * (n_dis.cast("double") / n_tok)
        + F.lit(0.4) * (F.least(n_tok, F.lit(100)).cast("double") / 100)
    )
    scored = d.select("doc_id", "source", quality.alias("quality"))
    w = W.partitionBy("source").orderBy("quality", "doc_id")
    pct = F.percent_rank().over(w)
    return scored.select(
        "doc_id",
        "source",
        "quality",
        pct.alias("source_pctile"),
        F.when(pct >= 0.5, "keep").otherwise("drop").alias("verdict"),
    )


# ---- deterministic epoch shuffle + shard manifest -------------------------

N_SHARDS = 8
EPOCH_SALT = "ep1|"  # bump per epoch: a new salt is a fresh permutation


def epoch_key_cols() -> tuple:
    """(key, shard, member_h) Column expressions for the epoch layout
    — THE single definition shared by the manifest query and the
    write-side test, built on portable_hash.hex_slice so the parse
    idiom can't drift per consumer. member_h is a 16-BIT slice: the
    checksum is SUM(member_h), and 2^16 max per row keeps the int64
    sum overflow-free to ~1.4e14 docs per shard (a 32-bit slice would
    hit ANSI ARITHMETIC_OVERFLOW at ~4e9 docs/shard — inside the
    operator's advertised scale)."""
    key = F.md5(F.concat(F.lit(EPOCH_SALT), F.col("doc_id").cast("string")))
    shard = hex_slice(key, 1, 8) % N_SHARDS
    member_h = hex_slice(key, 9, 4)
    return key, shard, member_h


@query(
    "epoch_shuffle_shards",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             md5(CONCAT('{EPOCH_SALT}', CAST(doc_id AS VARCHAR))) AS key
      FROM documents),
    sharded AS (
      SELECT doc_id, n_chars, key,
             {sql_hex_slice('key', 1, 8)} % {N_SHARDS} AS shard,
             {sql_hex_slice('key', 9, 4)} AS member_h
      FROM keyed)
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS char_mass,
           MIN(key) AS first_key,
           MAX(key) AS last_key,
           CAST(SUM(member_h) AS BIGINT) AS key_checksum
    FROM sharded GROUP BY shard
    """,
)
def epoch_shuffle_shards(spark, sf_dir):
    """Training-epoch shuffle as a MANIFEST, not a sort: every doc
    gets a salted-hash key (new salt per epoch = fresh deterministic
    permutation), its shard is a slice of that key, and the query
    emits the per-shard audit row (doc count, char mass, key range,
    membership checksum) that a dataloader validates before reading.

    The scale point is what this DOESN'T do: no global sort and no
    RNG. Hash-bucketing into shards is a map-only decision, the
    manifest is one partial-aggregatable groupBy({N_SHARDS} keys),
    and the within-shard order is implied (each shard's writer sorts
    its own slice by key — a per-shard local sort, never a global
    one). The checksum is a SUM of a second key slice (16 bits per
    row — int64-safe to ~1.4e14 docs/shard, see epoch_key_cols):
    associative, order-independent, and stable under any
    partitioning, so two independent runs of the same epoch can
    assert identical shard membership without comparing doc lists.
    hex_slice / sql_hex_slice (portable_hash) guarantee both engines
    parse the slices identically.

    Write-side gotcha (pinned in tests/test_r5_operators.py): when
    materializing the epoch with write.partitionBy("shard"), sort
    within partitions by (shard, key), not key alone — the partitioned
    write requires rows clustered by the partition column and inserts
    its own UNSTABLE sort on `shard` if the incoming order doesn't
    already satisfy it, silently scrambling the per-shard key order
    the manifest's first/last keys describe."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    key, shard, member_h = epoch_key_cols()
    keyed = d.select(
        "n_chars",
        key.alias("key"),
        shard.alias("shard"),
        member_h.alias("member_h"),
    )
    return keyed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("char_mass"),
        F.min("key").alias("first_key"),
        F.max("key").alias("last_key"),
        F.sum("member_h").alias("key_checksum"),
    )


# RAG / retrieval-index chunking geometry: fixed character windows
# with overlap, the standard retrieval-unit shape. Stride < chunk ⇒
# every boundary sentence appears in two chunks.
RAG_CHUNK = 256
RAG_STRIDE = 192

# Integer-only chunk count: index of the LAST chunk for a doc of
# n characters — 0 for n <= chunk, else ceil((n - chunk) / stride)
# via the add-(stride-1) trick. Pure bigint arithmetic so Spark and
# DuckDB agree at every boundary (no double ceil).
_LAST_CHUNK_SPARK = (
    f"(GREATEST(n_chars - {RAG_CHUNK}, 0) + {RAG_STRIDE - 1}) DIV {RAG_STRIDE}"
)
_LAST_CHUNK_DUCK = (
    f"(GREATEST(n_chars - {RAG_CHUNK}, 0) + {RAG_STRIDE - 1}) // {RAG_STRIDE}"
)

_CHUNK_CTES = f"""chunks AS (
      SELECT d.doc_id, d.source, r.i AS chunk_idx,
             r.i * {RAG_STRIDE} + 1 AS chunk_start,
             length(substr(d.text, CAST(r.i * {RAG_STRIDE} + 1 AS BIGINT),
                           {RAG_CHUNK})) AS chunk_len,
             md5(substr(d.text, CAST(r.i * {RAG_STRIDE} + 1 AS BIGINT),
                        {RAG_CHUNK})) AS chunk_md5
      FROM documents d,
           UNNEST(range(0, {_LAST_CHUNK_DUCK} + 1)) AS r(i))"""


def _chunks(spark, sf_dir):
    """(doc_id, source, chunk_idx, chunk_start, chunk_len, chunk_md5)
    — one row per overlapping chunk window. Map-only: sequence +
    explode + substring; the fan-out is ~n_chars/stride rows per
    doc and nothing shuffles."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "source",
            "text",
            F.explode(
                F.expr(f"sequence(0, {_LAST_CHUNK_SPARK})")
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "source",
            "chunk_idx",
            (F.col("chunk_idx") * RAG_STRIDE + 1).alias("chunk_start"),
            F.expr(
                f"substring(text, CAST(chunk_idx * {RAG_STRIDE} + 1 AS INT), "
                f"{RAG_CHUNK})"
            ).alias("chunk_text"),
        )
        .select(
            "doc_id",
            "source",
            "chunk_idx",
            "chunk_start",
            F.length("chunk_text").cast("bigint").alias("chunk_len"),
            F.md5("chunk_text").alias("chunk_md5"),
        )
    )


@query(
    "rag_chunk_manifest",
    oracle=f"""
    WITH {_CHUNK_CTES}
    SELECT doc_id, chunk_idx, chunk_start,
           CAST(chunk_len AS BIGINT) AS chunk_len, chunk_md5
    FROM chunks
    """,
)
def rag_chunk_manifest(spark, sf_dir):
    """Retrieval-unit chunking manifest: every document split into
    {RAG_CHUNK}-char windows at a {RAG_STRIDE}-char stride (overlap
    {RAG_CHUNK - RAG_STRIDE}), emitting (doc_id, chunk_idx,
    chunk_start, chunk_len, chunk_md5) — the table a RAG indexer
    embeds and a dataloader uses to map retrieved chunks back to
    source spans. The chunk COUNT per doc is computed in pure bigint
    arithmetic (ceil((n-chunk)/stride) via add-(stride-1)), so both
    engines enumerate identical windows at every length boundary —
    including the n_chars <= {RAG_CHUNK} single-chunk case and the
    empty doc.

    Scale shape: map-only — sequence/explode fans each doc to
    ~n_chars/{RAG_STRIDE} rows, substring+md5 are per-row, nothing
    shuffles; at 100 TB this pipelines at scan bandwidth and the
    manifest (≈50 B/chunk) is ~1/4 the corpus size. The md5 is the
    downstream join key for chunk-level dedup and for
    embedding-table upserts."""
    return _chunks(spark, sf_dir).select(
        "doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_md5"
    )


@query(
    "chunk_dedup_stats",
    oracle=f"""
    WITH {_CHUNK_CTES},
    freq AS (
      SELECT chunk_md5, COUNT(*) AS n_occ
      FROM chunks GROUP BY chunk_md5)
    SELECT c.source,
           COUNT(*) AS total_chunks,
           COUNT(DISTINCT c.chunk_md5) AS distinct_chunks,
           CAST(SUM(CASE WHEN f.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS duplicated_chunks
    FROM chunks c JOIN freq f ON c.chunk_md5 = f.chunk_md5
    GROUP BY c.source
    """,
)
def chunk_dedup_stats(spark, sf_dir):
    """Chunk-level duplication profile per source — the dedup
    decision RAG indexes actually need: document-level near-dup
    misses boilerplate chunks shared across otherwise-distinct docs,
    while chunk-md5 frequency catches exactly the units that would
    be embedded twice. Emits per source: total chunk count, distinct
    chunk hashes, and how many chunk instances are corpus-wide
    duplicates (hash seen >1 time anywhere, not just within the
    source).

    Scale shape: one partial-aggregated groupBy on chunk_md5 (the
    frequency table), one co-partitioned join back on the same key
    (no second shuffle of the chunks under AQE same-key planning),
    one source-keyed rollup. All counters are bigints — nothing
    float crosses a row boundary."""
    c = _chunks(spark, sf_dir)
    freq = c.groupBy("chunk_md5").agg(F.count("*").alias("n_occ"))
    return (
        c.join(freq, "chunk_md5")
        .groupBy("source")
        .agg(
            F.count("*").alias("total_chunks"),
            F.countDistinct("chunk_md5").alias("distinct_chunks"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("duplicated_chunks"),
        )
    )
