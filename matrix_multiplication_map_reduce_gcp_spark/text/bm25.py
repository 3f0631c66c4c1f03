"""Okapi BM25 ranked retrieval over the document corpus.

The reference engine's only text "query" is its single hardcoded
pipeline; BM25 is the standard IR extension of the TF-IDF weighting
already in tfidf.py (reference parity: none — north-star text
analysis per SURVEY.md §2.3). Scoring uses the Lucene BM25 variant
idf = ln(1 + (N - df + 0.5)/(df + 0.5)), which is non-negative for
every df.

Determinism contract (see functions/exact.py conventions): tf, df,
dl, N, total_len are exact integers; avgdl = total_len/N is one
double division (identical in both engines); each per-term
contribution is rounded to 6 digits and cast DECIMAL(18,6) so the
per-(query,doc) SUM is an exact decimal aggregate — order-independent
under any partitioning — and only then cast to DOUBLE.

Scale shape (100 TB): the query set is tiny (broadcast); df and the
corpus stats are one map-side-combined aggregation each; the scoring
join explodes only matching (term → doc) postings, never the corpus
cross product. Top-k per query is a TakeOrdered-style window over
query_id partitions (|queries| partitions, each already reduced to
scored candidates).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

K1 = 1.2
B = 0.75
TOP_K = 5

# (query_id, query_text) — terms drawn from the synthetic corpus
# vocabulary so every query has matches at every SF.
QUERY_SET = (
    (1, "spark join fast"),
    (2, "hash table scan"),
    (3, "stream window batch"),
)


def _sql_query_values() -> str:
    return ", ".join(f"({i}, '{t}')" for i, t in QUERY_SET)


@query(
    "bm25_topk",
    oracle=f"""
    WITH q(query_id, query_text) AS (VALUES {_sql_query_values()}),
    qt AS (SELECT query_id, UNNEST(string_split(query_text, ' ')) AS term FROM q),
    tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_len
          FROM documents),
    contrib AS (
      SELECT qt.query_id, tf.doc_id,
             CAST(ROUND(
               ln(1 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({K1} + 1))
               / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl
                   / (CAST(n.total_len AS DOUBLE) / n.n_docs))),
               6) AS DECIMAL(18,6)) AS c
      FROM qt
      JOIN tf ON qt.term = tf.term
      JOIN df ON qt.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN n),
    scored AS (
      SELECT query_id, doc_id, CAST(CAST(SUM(c) AS STRING) AS DOUBLE) AS bm25
      FROM contrib GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS rn
      FROM scored)
    SELECT query_id, doc_id, bm25, CAST(rn AS INTEGER) AS rank
    FROM ranked WHERE rn <= {TOP_K}
    """,
)
def bm25_topk(spark, sf_dir):
    """Top-5 documents per query under BM25(k1=1.2, b=0.75).

    One token explode feeds tf/df/corpus stats; the tiny query-term
    table and df/stats rows are broadcast into the postings join.
    """
    d = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        list(QUERY_SET), "query_id int, query_text string"
    )
    qt = q.select(
        "query_id", F.explode(F.split("query_text", " ")).alias("term")
    )
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    stats = d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_len"),
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / avgdl)
    )
    # The stats side is ONE row — crossJoin(broadcast) plans as a
    # BroadcastNestedLoopJoin with a single-row build side, i.e. a
    # scalar pin, not a data product (a constant-key equi-join gets
    # folded back to the same plan anyway).
    contrib = (
        F.broadcast(qt)
        .join(tf, "term")
        .join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(idf * tfn, 6).cast("decimal(18,6)").alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("double").alias("bm25")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "doc_id", "bm25", "rank")
    )
