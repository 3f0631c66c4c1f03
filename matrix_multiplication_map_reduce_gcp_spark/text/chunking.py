"""Document chunking + PII scrubbing — the last-mile operators of an
LLM training-data pipeline (context-window packing and redaction).

Chunking: overlapping token windows (size/stride) via JVM-side
transform+slice — the 1→N expansion stays inside codegen, no Python.
Scrubbing: regexp redaction with per-doc redaction accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

CHUNK_SIZE = 40
CHUNK_STRIDE = 30  # 10-token overlap


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_chunk_tokens): overlapping
    windows over the token stream; the final partial window is kept
    (LLM pipelines pad it)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    chunks = F.expr(
        f"transform(sequence(0, greatest(CAST(ceil((size(t) - {size}) / {stride}.0) AS INT), 0)),"
        f" i -> struct(i AS chunk_idx,"
        f" concat_ws(' ', slice(t, i * {stride} + 1, {size})) AS chunk_text,"
        f" size(slice(t, i * {stride} + 1, {size})) AS n_chunk_tokens))"
    )
    return (
        toks.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        )
    )


@query(
    "doc_chunking",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    idx AS (
      SELECT doc_id, t,
             UNNEST(range(0, greatest(CAST(ceil((len(t) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS BIGINT), 0) + 1)) AS i
      FROM toks)
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(t[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' ') AS chunk_text,
           len(t[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}]) AS n_chunk_tokens
    FROM idx
    """,
)
def doc_chunking(spark, sf_dir):
    """Overlapping 40-token chunks with stride 30 per document."""
    return chunk_documents(load_table(spark, sf_dir, "documents"))


@query(
    "benchmark_decontamination",
    oracle="""
    WITH bench AS (SELECT * FROM documents WHERE doc_id % 50 = 0),
    train AS (SELECT * FROM documents WHERE doc_id % 50 != 0),
    bench_sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
             || ' ' || t[i+4] AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM bench),
           UNNEST(range(1, greatest(len(t) - 3, 1))) AS r(i)),
    train_sh AS (
      SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
             || ' ' || t[i+4] AS sh
      FROM (SELECT string_split(text, ' ') AS t FROM train),
           UNNEST(range(1, greatest(len(t) - 3, 1))) AS r(i)),
    hits AS (
      SELECT b.doc_id, COUNT(*) AS contaminated
      FROM bench_sh b JOIN train_sh tr ON b.sh = tr.sh
      GROUP BY b.doc_id),
    totals AS (SELECT doc_id, COUNT(*) AS total FROM bench_sh GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(h.contaminated, 0) AS contaminated_shingles,
           t.total AS total_shingles,
           CAST(COALESCE(h.contaminated, 0) AS DOUBLE) / t.total AS containment
    FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
)
def benchmark_decontamination(spark, sf_dir):
    """Benchmark decontamination: for each held-out 'benchmark' doc,
    the fraction of its 5-gram shingles that appear anywhere in the
    'training' split — the canonical train/test contamination check.
    Shape at 100 TB: distinct training shingles (one dedup shuffle)
    semi-joined against benchmark shingles; integer-ratio output."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)

    from .analysis import shingle_rows

    bench_sh = shingle_rows(bench, n=5)
    train_sh = shingle_rows(train, n=5).select("shingle").distinct()
    totals = bench_sh.groupBy("doc_id").agg(F.count("*").alias("total"))
    hits = (
        bench_sh.join(train_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("contaminated"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("contaminated", F.lit(0)).alias("contaminated_shingles"),
        F.col("total").alias("total_shingles"),
        (
            F.coalesce("contaminated", F.lit(0)).cast("double") / F.col("total")
        ).alias("containment"),
    )


@query(
    "pii_scrub_accounting",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_redactions,
           len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')) AS n_email_redactions,
           length(regexp_replace(regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                                 '[0-9]+', '<NUM>', 'g')) AS scrubbed_len
    FROM documents
    """,
)
def pii_scrub_accounting(spark, sf_dir):
    """PII scrubbing with redaction accounting: emails then digit runs
    replaced by placeholder tokens; per-doc counts of what was
    removed (the audit trail a compliance pipeline must emit)."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", r"[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
        r"[0-9]+",
        "<NUM>",
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[0-9]+")).cast("bigint").alias(
            "n_number_redactions"
        ),
        F.regexp_count("text", F.lit(r"[a-z0-9.]+@[a-z0-9.]+")).cast("bigint").alias(
            "n_email_redactions"
        ),
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
    )
