"""Arrow-vectorized Pandas UDFs: the sanctioned Python escape hatch
(SURVEY.md §2.3 UDF row). Scalar and grouped-aggregate variants, both
oracle-checked — the UDF bodies compute engine-reproducible arithmetic
(integer counts, rounded ratios), demonstrating that even Python-side
operators can stay inside the exactness discipline.

UDFs are created inside the query functions: Spark 4's pandas_udf
resolves the return type eagerly and needs an active session, so
module-level decoration would break import order. Bodies are
self-contained closures (worker-serialization rule).
"""

# NB: no `from __future__ import annotations` here — pandas_udf infers
# the UDF kind from the REAL annotation objects; stringified ones fail.
import pandas as pd

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _vowel_ratio_udf():
    @F.pandas_udf("double")
    def vowel_ratio(text: pd.Series) -> pd.Series:
        # Integer floor grid, NOT .round(6): a ratio landing exactly on
        # a 5e-7 boundary (e.g. 45/128 = 0.3515625) rounds half-EVEN in
        # numpy/pandas but half-AWAY in DuckDB's ROUND — found as a
        # real sf0.1 hash mismatch. floor((v*1e6)//l)/1e6 is exact
        # integer arithmetic, identical in any engine.
        import numpy as np

        vowels = text.str.count(r"[aeiou]").astype("int64")
        letters = text.str.count(r"[a-z]").astype("int64")
        micro = np.where(
            letters > 0,
            (vowels * 1_000_000) // np.maximum(letters, 1),
            np.nan,
        )
        return pd.Series(micro / 1_000_000.0)

    return vowel_ratio


def _weighted_avg_udf():
    @F.pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        # grouped-agg pandas_udf: one scalar per group. Cents-integer
        # arithmetic keeps the sum exact in any accumulation order;
        # the final value is FLOORED onto the 1e-6 grid in exact int
        # arithmetic (Python round() is half-even, DuckDB's ROUND is
        # half-away — same divergence class as the vowel-ratio bug).
        cents = (price * 100).round().astype("int64")  # 2-dec inputs: no .5 cases
        q = qty.round().astype("int64")  # integral inputs
        total = int((cents * q).sum())
        qsum = int(q.sum())
        return ((total * 1_000_000) // (qsum * 100)) / 1_000_000.0

    return weighted_avg_price


@query(
    "pandas_udf_vowel_ratio",
    oracle="""
    SELECT doc_id,
           CASE WHEN len(regexp_extract_all(text, '[a-z]')) = 0
                THEN CAST('nan' AS DOUBLE)
                ELSE CAST((CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT)
                           * 1000000)
                          // len(regexp_extract_all(text, '[a-z]')) AS DOUBLE)
                     / 1000000 END AS vowel_ratio
    FROM documents
    """,
)
def pandas_udf_vowel_ratio(spark, sf_dir):
    """Scalar pandas_udf (Arrow-batched, ~10-100× over row-at-a-time
    Python): per-doc vowel/letter ratio. The oracle recomputes the
    same integer counts in SQL."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", _vowel_ratio_udf()("text").alias("vowel_ratio"))


@query(
    "pandas_udf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST((SUM(CAST(l_extendedprice * 100 AS BIGINT) * CAST(l_quantity AS BIGINT))
                 * 1000000)
                // (SUM(CAST(l_quantity AS BIGINT)) * 100) AS DOUBLE)
           / 1000000 AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pandas_udf_weighted_avg(spark, sf_dir):
    """Grouped-aggregate pandas_udf: quantity-weighted mean price per
    return flag, computed in exact cents-integer arithmetic inside the
    UDF so the result is order-independent and oracle-matchable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _weighted_avg_udf()("l_extendedprice", "l_quantity").alias("wavg_price")
    )
