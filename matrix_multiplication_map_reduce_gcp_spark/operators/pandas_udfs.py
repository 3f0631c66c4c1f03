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


# Cogroup bucket count: the per-call Arrow overhead amortizer (see
# cogroup_events_before_order docstring). Scales like shuffle
# partitions: pick so one bucket's frames fit an Arrow batch.
COGROUP_BUCKETS = 64


@query(
    "cogroup_events_before_order",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           o.o_custkey AS o_custkey,
           CAST((SELECT COUNT(*) FROM events e
                 WHERE e.user_id = o.o_custkey
                   AND CAST(ts AS TIMESTAMP) < o.o_orderdate)
                AS BIGINT) AS n_events_before
    FROM orders o
    """,
)
def cogroup_events_before_order(spark, sf_dir):
    """Cogrouped applyInPandas (FlatMapCoGroupsInPandas): the escape
    hatch for per-key TWO-SIDED custom merges joins can't express —
    both relations shuffle ONCE, co-partitioned on the key, and each
    key's pair of Arrow frames arrives for arbitrary two-sided logic.
    Here: for every order, how many of that user's events strictly
    precede it. The oracle is the correlated-count equivalent (DuckDB
    decorrelates it to the same co-grouped shape).

    The cogroup KEY is a BUCKET of users (user_id mod COGROUP_BUCKETS),
    not the raw user — the production discipline for this API: Spark
    invokes the Python function once per key, so raw-entity keys pay
    ~1 ms of Arrow/pandas overhead per entity (first cut measured
    ~12 s at sf0.1 for ~13k users, almost all of it per-call cost).
    Bucketing amortizes that to COGROUP_BUCKETS calls and the per-user
    logic vectorizes INSIDE the bucket: one lexsort of the combined
    (user, ts, kind) rows with orders ordered before events on ties
    (strict '<' semantics), then a per-user-rebased cumulative event
    count — O(n log n) per bucket, zero per-user Python cost.

    At 100 TB this is the footprint of any per-entity sequence logic
    (sessionized replay, per-user feature backfill): shuffle both
    sides by bucket once; choose COGROUP_BUCKETS so a bucket's two
    frames fit an Arrow batch comfortably (buckets ∝ data volume,
    like shuffle partitions — entities never straddle buckets)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    ob = o.withColumn("b", F.pmod("o_custkey", F.lit(COGROUP_BUCKETS)))
    eb = e.withColumn("b", F.pmod("user_id", F.lit(COGROUP_BUCKETS)))

    def align(orders_pdf, events_pdf):
        import numpy as np
        import pandas as pd

        no = len(orders_pdf)
        if no == 0:
            return pd.DataFrame(
                {"o_orderkey": [], "o_custkey": [], "n_events_before": []}
            ).astype(
                {"o_orderkey": "int64", "o_custkey": "int64",
                 "n_events_before": "int64"}
            )
        o_u = orders_pdf["o_custkey"].to_numpy(dtype="int64")
        o_t = (
            orders_pdf["o_orderdate"]
            .to_numpy(dtype="datetime64[us]")
            .astype("int64")
        )
        e_u = events_pdf["user_id"].to_numpy(dtype="int64")
        e_t = events_pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        u = np.concatenate([o_u, e_u])
        t = np.concatenate([o_t, e_t])
        kind = np.concatenate(  # orders sort before events on ts ties:
            [np.zeros(no, dtype="int64"), np.ones(len(e_u), dtype="int64")]
        )  # equal-ts events must NOT count (strict '<')
        row = np.concatenate([np.arange(no), np.full(len(e_u), -1)])
        perm = np.lexsort((kind, t, u))
        k = kind[perm]
        before = np.cumsum(k) - k  # events strictly above this row
        us = u[perm]
        start = np.r_[True, us[1:] != us[:-1]]
        base = np.maximum.accumulate(np.where(start, before, -1))
        per_user = before - base  # rebased at each user's first row
        sel = perm[row[perm] >= 0]
        orow = row[sel]
        out = np.empty(no, dtype="int64")
        out[orow] = per_user[row[perm] >= 0]
        return pd.DataFrame(
            {
                "o_orderkey": orders_pdf["o_orderkey"].to_numpy(),
                "o_custkey": orders_pdf["o_custkey"].to_numpy(),
                "n_events_before": out,
            }
        )

    return (
        ob.groupby("b")
        .cogroup(eb.groupby("b"))
        .applyInPandas(
            align,
            "o_orderkey bigint, o_custkey bigint, n_events_before bigint",
        )
    )


@query(
    "arrow_embedding_qnorms",
    oracle="""
    SELECT vec_id,
           CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                    * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS qnorm_sq
    FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings)
    GROUP BY vec_id
    """,
)
def arrow_embedding_qnorms(spark, sf_dir):
    """mapInArrow — the lowest-overhead Python surface: raw Arrow
    RecordBatches cross the boundary with NO pandas materialization
    (one conversion layer below mapInPandas). The list column is
    consumed zero-copy: NumPy views the flat values buffer and the
    offsets buffer directly, computes per-vector squared L2 norms on
    the 1e-6 integer grid (the kmeans quantization contract — exact,
    so the UNNEST oracle hash-matches bit-for-bit), and one
    subtract-of-cumsums segments the flat squares back into vectors.
    No per-row or per-vector Python: two buffer views and four
    vectorized ops per batch.

    At 100 TB: map-only (zero shuffle), Arrow batch size bounds
    memory, and the pattern is the template for any fused
    vector-kernel stage (normalization, dtype narrowing, feature
    hashing) where even pandas' block manager overhead matters."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def qnorms(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            emb = b.column(b.schema.get_field_index("embedding"))
            offs = np.asarray(emb.offsets)
            vals = np.asarray(emb.values, dtype=np.float64)
            q = np.floor(vals * 1_000_000).astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(q * q)])
            norms = csum[offs[1:]] - csum[offs[:-1]]
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("vec_id")),
                    pa.array(norms, type=pa.int64()),
                ],
                ["vec_id", "qnorm_sq"],
            )

    return e.mapInArrow(qnorms, "vec_id bigint, qnorm_sq bigint")
