"""Exact n-gram Jaccard similarity between candidate document pairs.

Candidates are restricted to the same (lang, source) partition — the
blocking key — so the shingle self-join never degenerates into a
cross-join. Jaccard = |∩| / |∪| on distinct shingle sets; all-integer
counts, so the final double division is exactly reproducible.

Scale guard (the 100 TB lever): a stop-shingle — one that appears in
nearly every document of a block ("of the and") — makes that
shingle's join group quadratic in the block's document count. Before
the self-join we aggregate per-(shingle, lang, source) document
frequency and DROP shingles with df > max_df, bounding any single
join group's output at max_df². Sizes (the Jaccard denominator) are
computed over the same filtered shingle space, so similarity is
measured on informative shingles only — the standard web-dedup
formulation — and the SQL oracle mirrors the identical filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..text.analysis import shingle_rows, sql_shingle_rows

# A shingle shared by more than MAX_DF docs of one (lang, source) block
# identifies nothing; it only manufactures ~df² candidate pairs.
MAX_DF = 100


def _capped_intersections(docs, shingle_n: int, max_df: int):
    """Shared candidate machinery for every exact pairwise measure:
    df-capped blocked shingle space -> (inter, sizes), where inter is
    one |S(a) ∩ S(b)| count per unordered same-(lang, source) pair and
    sizes is each doc's |S| over the SAME filtered shingle space.
    Jaccard and containment divide these counts differently, but the
    blocking key, df cap, and distinct-shingle contract live here ONCE
    (review r4: the copy-pasted pipelines could drift apart while both
    still passed their own mirrored oracles)."""
    sh = shingle_rows(docs, n=shingle_n, keep_cols=("lang", "source"))
    # Document frequency via a COUNT window on the same key the
    # self-join shuffles on — one shuffle that the join then reuses
    # (vs. a groupBy + equi-join back, which costs two extra shuffles).
    df_w = W.partitionBy("shingle", "lang", "source")
    sh = (
        sh.withColumn("df_count", F.count("*").over(df_w))
        .filter(F.col("df_count") <= max_df)
        .drop("df_count")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle", "lang", "source")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle", "lang", "source")
    inter = (
        a.join(b, ["shingle", "lang", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return inter, sizes


def _sql_capped_intersections(shingle_n: int, max_df: int) -> str:
    """DuckDB mirror of :func:`_capped_intersections` as CTE bodies
    (defines sh_all/keep/sh/sizes/inter for the caller to extend)."""
    return f"""sh_all AS ({sql_shingle_rows(shingle_n, keep_cols=("lang", "source"))}),
    keep AS (
      SELECT shingle, lang, source FROM sh_all
      GROUP BY shingle, lang, source
      HAVING COUNT(*) <= {max_df}),
    sh AS (
      SELECT s.* FROM sh_all s
      JOIN keep k ON s.shingle = k.shingle AND s.lang = k.lang
                 AND s.source = k.source),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                         AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2)"""


def jaccard_pairs(
    docs: DataFrame,
    shingle_n: int = 3,
    threshold: float = 0.2,
    max_df: int = MAX_DF,
) -> DataFrame:
    """(doc_a, doc_b, inter, union_n, jaccard) for same-(lang,source)
    pairs with Jaccard ≥ threshold over shingles with df ≤ max_df."""
    inter, sizes = _capped_intersections(docs, shingle_n, max_df)
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


def sql_jaccard_pairs(
    shingle_n: int = 3, threshold: float = 0.2, max_df: int = MAX_DF
) -> str:
    return f"""
    WITH {_sql_capped_intersections(shingle_n, max_df)}
    SELECT i.doc_a, i.doc_b, i.inter,
           sa.n_sh + sb.n_sh - i.inter AS union_n,
           CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) AS jaccard
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                 JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) >= {threshold}
    """


CONTAIN_THRESHOLD = 0.4  # |S(A) ∩ S(B)| / |S(A)| to flag A ⊂~ B


def containment_pairs(
    docs: DataFrame,
    shingle_n: int = 3,
    threshold: float = CONTAIN_THRESHOLD,
    max_df: int = MAX_DF,
) -> DataFrame:
    """DIRECTED near-containment: (contained, container) pairs where
    |S(contained) ∩ S(container)| / |S(contained)| ≥ threshold.

    Jaccard misses the quote/boilerplate case — a short doc fully
    embedded in a long one has tiny |∩|/|∪| but containment ≈ 1 — so
    sub-document dedup needs the ASYMMETRIC measure (Broder's
    containment). Same df-capped blocked self-join as jaccard_pairs
    (one intersect count per unordered pair, shared machinery in
    _capped_intersections), then each pair fans out to its two
    directions and is filtered on the direction's own denominator —
    no extra shuffle for the asymmetry."""
    inter, sizes = _capped_intersections(docs, shingle_n, max_df)
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    sized = inter.join(na, "doc_a").join(nb, "doc_b")
    fwd = sized.select(
        F.col("doc_a").alias("contained"),
        F.col("doc_b").alias("container"),
        "inter",
        F.col("n_a").alias("n_contained"),
    )
    rev = sized.select(
        F.col("doc_b").alias("contained"),
        F.col("doc_a").alias("container"),
        "inter",
        F.col("n_b").alias("n_contained"),
    )
    cont = F.col("inter").cast("double") / F.col("n_contained").cast("double")
    return (
        fwd.union(rev)
        .select("contained", "container", "inter", "n_contained",
                cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def sql_containment_pairs(
    shingle_n: int = 3,
    threshold: float = CONTAIN_THRESHOLD,
    max_df: int = MAX_DF,
) -> str:
    return f"""
    WITH {_sql_capped_intersections(shingle_n, max_df)},
    sized AS (
      SELECT i.doc_a, i.doc_b, i.inter, sa.n_sh AS n_a, sb.n_sh AS n_b
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                   JOIN sizes sb ON i.doc_b = sb.doc_id),
    directed AS (
      SELECT doc_a AS contained, doc_b AS container, inter, n_a AS n_contained FROM sized
      UNION ALL
      SELECT doc_b, doc_a, inter, n_b FROM sized)
    SELECT contained, container, inter, n_contained,
           CAST(inter AS DOUBLE) / CAST(n_contained AS DOUBLE) AS containment
    FROM directed
    WHERE CAST(inter AS DOUBLE) / CAST(n_contained AS DOUBLE) >= {threshold}
    """
