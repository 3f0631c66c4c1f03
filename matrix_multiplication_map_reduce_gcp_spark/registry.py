"""Central query registry consumed by ``__spark_entry__.py``.

Every implemented operator registers a named query (spark, sf_dir) →
DataFrame, optionally with the equivalent DuckDB oracle SQL. The
driver's correctness gate runs both and hash-compares results
(row-count + schema + order-insensitive value hash), so:

- column names must match between the two (alias everything);
- float-producing aggregations must be order-independent (see
  functions/exact.py) or explicitly rounded;
- hash-dependent operators must use engine-portable hashing (see
  functions/portable_hash.py).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the registered fixture views


QUERIES: dict[str, QueryDef] = {}

# Modules that register queries at import time.
_QUERY_MODULES = (
    "matrix_multiplication_map_reduce_gcp_spark.operators.matrix_queries",
    "matrix_multiplication_map_reduce_gcp_spark.operators.relational",
    "matrix_multiplication_map_reduce_gcp_spark.operators.windows",
    "matrix_multiplication_map_reduce_gcp_spark.operators.setops",
    "matrix_multiplication_map_reduce_gcp_spark.operators.asof",
    "matrix_multiplication_map_reduce_gcp_spark.operators.approx",
    "matrix_multiplication_map_reduce_gcp_spark.operators.scalar_funcs",
    "matrix_multiplication_map_reduce_gcp_spark.operators.sql_api",
    "matrix_multiplication_map_reduce_gcp_spark.operators.iterative",
    "matrix_multiplication_map_reduce_gcp_spark.operators.skew",
    "matrix_multiplication_map_reduce_gcp_spark.operators.merge",
    "matrix_multiplication_map_reduce_gcp_spark.operators.stats",
    "matrix_multiplication_map_reduce_gcp_spark.operators.timeseries",
    "matrix_multiplication_map_reduce_gcp_spark.operators.sketches",
    "matrix_multiplication_map_reduce_gcp_spark.operators.pandas_udfs",
    "matrix_multiplication_map_reduce_gcp_spark.operators.analytics",
    "matrix_multiplication_map_reduce_gcp_spark.operators.pagerank",
    "matrix_multiplication_map_reduce_gcp_spark.operators.incremental",
    "matrix_multiplication_map_reduce_gcp_spark.text.embeddings",
    "matrix_multiplication_map_reduce_gcp_spark.text.chunking",
    "matrix_multiplication_map_reduce_gcp_spark.dedup.queries",
    "matrix_multiplication_map_reduce_gcp_spark.similarity.queries",
    "matrix_multiplication_map_reduce_gcp_spark.text.queries",
    "matrix_multiplication_map_reduce_gcp_spark.text.tfidf",
    "matrix_multiplication_map_reduce_gcp_spark.text.bm25",
    "matrix_multiplication_map_reduce_gcp_spark.streaming.queries",
    "matrix_multiplication_map_reduce_gcp_spark.multimodal.queries",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QueryDef(fn, oracle)
        return fn

    return deco


# The driver's round-1 correctness gate recorded rows for only the
# FIRST 50 registered queries (registration order). If that window is
# a cap, naive module ordering leaves whole categories (dedup,
# similarity, text, streaming, multimodal) without a driver-verified
# row. This prefix pins one-or-more representatives of EVERY SURVEY
# §2.3 category into the first 50 returned entries; the remaining
# queries follow in registration order. tests/test_registry_meta.py
# asserts the prefix stays complete and in sync.
# ROTATION QUEUE (round 4+): 101 queries have never received a
# driver-verified row (the window caps at 50). After the 9 events-
# dependent entries go green in round 3, swap proven representatives
# out for these, highest value first:
#   pq_codes, ann_pq_adc_topk, ann_pq_rerank_topk, ann_ivfpq_topk,
#   stream_running_user_totals, stream_sliding_counts, stream_static_enrich,
#   sorted_neighborhood_pairs, dedup_keep_list, dedup_cluster_size_histogram,
#   batch_session_window, pit_feature_join, weekly_retention_cohorts,
#   lateral_top2_suppliers, correlated_exists_orders, pii_scrub_accounting,
#   doc_chunking, duplicate_spans, quality_filter_verdict, bloom_join_prune,
#   zorder_morton_keys, multimodal_image_dup_groups, supplier_balance_ranks,
#   matmul_sparse, matrix_gram, matvec, ...
# Keep >=1 representative per module (test_registry_meta pins this).
PRIORITY_PREFIX = (
    # matrix (reference O1-O14 core) — r3 rotation adds the two block
    # paths, never driver-checked before
    "matmul", "matmul_blocked", "matmul_mllib_blockmatrix",
    # relational scans/joins/aggs
    "pricing_summary", "region_nation_revenue", "top_orders",
    # window functions (+ SCD2 history, rotated in r3)
    "user_sessions", "scd2_user_event_history",
    # set ops
    "union_distinct_nations",
    # as-of / range joins
    "asof_last_order_before_event", "range_join_quantity_tiers",
    # approximate aggregates
    "approx_distinct_counts",
    # scalar functions
    "json_extraction",
    # SQL API / subqueries / end-to-end pipeline
    "training_data_pipeline", "not_in_null_semantics",
    # iterative / graph (triangle counting rotated in r3)
    "power_iteration_2step", "triangle_count_suppliers",
    # skew handling
    "skew_salted_hot_key_join",
    # MERGE / upsert
    "merge_upsert_orders",
    # stats + collection aggregates
    "collect_sorted_aggregates",
    # pandas UDFs
    "pandas_udf_weighted_avg",
    # product analytics
    "funnel_view_click_purchase",
    # incremental maintenance
    "incremental_agg_maintenance",
    # text embeddings + chunking
    "text_hash_embeddings", "benchmark_decontamination",
    # dedup (north star; levenshtein verifier rotated in r3)
    "dedup_exact", "minhash_lsh_pairs",
    "simhash_near_dup_pairs", "dedup_clusters",
    "stratified_sample_balanced", "levenshtein_near_dup_pairs",
    # similarity search (north star; hard-negative mining rotated in r3)
    "ann_brute_force_topk", "ann_lsh_topk", "ann_ivf_topk",
    "hard_negative_mining",
    # text analysis (north star)
    "doc_token_stats", "lang_id_stopwords", "doc_fingerprint",
    # sequence packing (rotated in r3)
    "sequence_pack_greedy",
    # streaming
    "stream_tumbling_counts", "stream_session_windows",
    "stream_stream_join_click_purchase", "stream_dedup_within_watermark",
    # multimodal
    "multimodal_image_meta", "multimodal_audio_windows",
    # tf-idf / language modeling
    "tfidf_top_terms",
    # deterministic sketches + clustering (round 2)
    "cms_heavy_hitters", "kmeans_assignments",
    # time-series + ranked retrieval (round 2)
    "time_weighted_value", "bm25_topk",
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (idempotent) and return the registry,
    reordered so PRIORITY_PREFIX comes first (driver-window coverage).

    Imports are STRICT: a broken module must fail loudly here, not
    silently shrink the registry (a swallowed ImportError once meant
    the gate went green while checking fewer queries)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in PRIORITY_PREFIX if n not in QUERIES]
    if missing:
        raise KeyError(f"PRIORITY_PREFIX names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in PRIORITY_PREFIX}
    ordered.update((n, qd) for n, qd in QUERIES.items() if n not in ordered)
    return ordered
