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
    # Canonical position: (index of the defining module in
    # _QUERY_MODULES, registration sequence within that module).
    # Recorded at decoration time so the registry's canonical order is
    # a pure function of the source, independent of which test or
    # caller happened to import which query module first (VERDICT r5:
    # insertion-order iteration made test_registry_window fail under
    # subset pytest invocations).
    order: tuple[int, int] = (0, 0)
    # EXACT-BASELINE marker (VERDICT r8 #4): True for audit-only
    # queries that deliberately emit every qualifying pair — quadratic
    # in duplicate-group size by contract — and therefore must never
    # be a production default at crawl scale. Every exact-baseline
    # query ships a bounded production sibling named
    # f"{name}_capped" (pinned by tests/test_registry_meta.py), and
    # the capped sibling's recall against this baseline is gated at
    # sf0.1 in tests/test_quality_gates.py.
    exact_baseline: bool = False


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
    "matrix_multiplication_map_reduce_gcp_spark.text.curation",
    "matrix_multiplication_map_reduce_gcp_spark.text.bm25",
    "matrix_multiplication_map_reduce_gcp_spark.streaming.queries",
    "matrix_multiplication_map_reduce_gcp_spark.multimodal.queries",
)


_MODULE_INDEX = {mod: i for i, mod in enumerate(_QUERY_MODULES)}
_MODULE_SEQ: dict[str, int] = {}


def query(
    name: str, oracle: str | None = None, exact_baseline: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL.
    ``exact_baseline=True`` marks an audit-only emit-all-pairs query
    (see QueryDef.exact_baseline)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        mod = fn.__module__
        seq = _MODULE_SEQ.get(mod, -1) + 1
        _MODULE_SEQ[mod] = seq
        QUERIES[name] = QueryDef(
            fn, oracle, (_MODULE_INDEX.get(mod, len(_QUERY_MODULES)), seq),
            exact_baseline,
        )
        return fn

    return deco


# The driver's correctness gate records rows for only the FIRST 50
# registered queries per round, so which queries ever get a
# driver-verified row is a scheduling problem. The window is now
# GENERATED: scripts/rotate_window.py derives it from the committed
# CORRECTNESS_r*.json evidence (never-green queries rotate in, every
# query module keeps >=1 representative, flagship stays pinned) and
# writes window.py; tests/test_registry_window.py re-derives it from
# the same recorded rounds and asserts equality, so the window can
# never silently drift from the evidence. Rotate after each round:
#   python scripts/rotate_window.py && python scripts/dump_registry.py
from matrix_multiplication_map_reduce_gcp_spark.window import PRIORITY_PREFIX


def canonical_queries() -> dict[str, QueryDef]:
    """Import every query module (idempotent) and return the registry
    in CANONICAL order — sorted by the (module index, per-module
    sequence) key recorded at decoration — so the result is identical
    no matter which modules were imported first by earlier callers.

    Imports are STRICT: a broken module must fail loudly here, not
    silently shrink the registry (a swallowed ImportError once meant
    the gate went green while checking fewer queries)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(sorted(QUERIES.items(), key=lambda kv: kv[1].order))


def load_all() -> dict[str, QueryDef]:
    """Canonical registry reordered so PRIORITY_PREFIX comes first
    (driver-window coverage)."""
    canonical = canonical_queries()
    missing = [n for n in PRIORITY_PREFIX if n not in canonical]
    if missing:
        raise KeyError(f"PRIORITY_PREFIX names not registered: {missing}")
    ordered = {n: canonical[n] for n in PRIORITY_PREFIX}
    ordered.update((n, qd) for n, qd in canonical.items() if n not in ordered)
    return ordered
