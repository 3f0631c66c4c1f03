"""Exact n-gram Jaccard similarity between candidate document pairs.

Candidates are restricted to the same (lang, source) partition — the
blocking key — so the shingle self-join never degenerates into a
cross-join. Jaccard = |∩| / |∪| on distinct shingle sets; all-integer
counts, so the final double division is exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import shingle_rows, sql_shingle_rows


def jaccard_pairs(docs: DataFrame, shingle_n: int = 3, threshold: float = 0.2) -> DataFrame:
    """(doc_a, doc_b, inter, union_n, jaccard) for same-(lang,source)
    pairs with Jaccard ≥ threshold."""
    sh = shingle_rows(docs, n=shingle_n, keep_cols=("lang", "source"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = sh.select(
        F.col("doc_id").alias("doc_a"), "shingle", "lang", "source"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), "shingle", "lang", "source"
    )
    inter = (
        a.join(b, ["shingle", "lang", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    union_n = F.col("n_a") + F.col("n_b") - F.col("inter")
    jac = F.col("inter").cast("double") / union_n.cast("double")
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            union_n.alias("union_n"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def sql_jaccard_pairs(shingle_n: int = 3, threshold: float = 0.2) -> str:
    return f"""
    WITH sh AS ({sql_shingle_rows(shingle_n, keep_cols=("lang", "source"))}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                         AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b, i.inter,
           sa.n_sh + sb.n_sh - i.inter AS union_n,
           CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) AS jaccard
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                 JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) >= {threshold}
    """
