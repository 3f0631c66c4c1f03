"""Dense ⇄ COO converters.

The reference's wire format is a JSON list-of-lists per matrix in a
GCS blob (reference orchestrator/main.py:58-64, test/test.py:38).
Spark-first equivalent: parse the JSON into ``array<array<double>>``
and shred it with two ``posexplode`` passes — fully JVM-side, no
Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def shred_json_matrix(spark: SparkSession, json_text: str) -> DataFrame:
    """One JSON list-of-lists string → COO DataFrame (i, j, v).

    Mirrors reference orchestrator/main.py:60 (``np.array(json.loads(...))``)
    but stays distributed: the parse is a from_json over a 1-row
    DataFrame; shredding is posexplode × 2.
    """
    schema = T.ArrayType(T.ArrayType(T.DoubleType()))
    df = spark.createDataFrame([(json_text,)], ["js"]).select(
        F.from_json("js", schema).alias("m")
    )
    return dense_rows_to_coo(
        df.select(F.posexplode("m").alias("i", "row")), idx="i", row_col="row"
    )


def dense_rows_to_coo(df: DataFrame, idx: str = "i", row_col: str = "row") -> DataFrame:
    """(row_index, array<double>) rows → COO (i, j, v), zeros dropped."""
    out = df.select(
        F.col(idx).cast("long").alias("i"), F.posexplode(row_col).alias("j", "v")
    ).select("i", F.col("j").cast("long").alias("j"), F.col("v").cast("double").alias("v"))
    return out.filter(F.col("v") != 0.0)


def coo_to_dense_rows(df: DataFrame, n_cols: int) -> DataFrame:
    """COO (i, j, v) → one row per i with a dense array<double> of
    length n_cols (missing entries zero-filled). The inverse of the
    reference's assembly loop (orchestrator/main.py:27-35), kept
    distributed: group per row index, scatter into a fixed-width array.
    """
    pairs = F.map_from_entries(
        F.collect_list(F.struct(F.col("j").cast("int"), F.col("v")))
    )
    return (
        df.groupBy("i")
        .agg(pairs.alias("m"))
        .select(
            "i",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_cols - 1)),
                lambda j: F.coalesce(F.element_at("m", j.cast("int") + 0), F.lit(0.0)),
            ).alias("row"),
        )
    )
