"""TF-IDF term weighting and bigram language-model counts over the
document corpus — the feature-extraction stage of a text pipeline.

Determinism: tf and df are integer counts; idf = ln(N/df) is a libm
call rounded to 6 digits in BOTH engines (identical inputs → identical
libm results on a given platform; the rounding removes residual
exposure). Rankings order by the rounded score with term tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored)
    SELECT doc_id, term, tf, df, tfidf FROM ranked WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document. One token explode feeds both
    the tf and df aggregations; df is broadcast back (vocabulary ≪
    corpus)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # planning-time scalar (metadata count — no scan)
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "bigram_lm_counts",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bigrams AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS r(i)),
    c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1)
    SELECT c2.w1, c2.w2, c2.c12, c1.c1,
           CAST(c2.c12 AS DOUBLE) / c1.c1 AS p_cond
    FROM c2 JOIN c1 ON c2.w1 = c1.w1
    WHERE c2.c12 >= 10
    """,
)
def bigram_lm_counts(spark, sf_dir):
    """Bigram language-model statistics: P(w2|w1) = c(w1,w2)/c(w1) —
    exact integer ratios; frequent bigrams only."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("t"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(t) < 2 THEN array() ELSE "
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2)) END"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c2.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (
        c2.join(c1, "w1")
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            (F.col("c12").cast("double") / F.col("c1")).alias("p_cond"),
        )
        .filter(F.col("c12") >= 10)
    )
