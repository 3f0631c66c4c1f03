"""Repo-WIDE static plan audit: every registered batch query's
physical plan is checked for the two unconditional 100 TB
scale-killers — CartesianProduct (an unbroadcast all-pairs product)
and row-at-a-time Python UDFs outside the explicitly-Pandas operators.

Unlike tests/test_plans.py (deep assertions on hand-picked
representatives), this sweep guarantees NO query — present or future —
can introduce a cartesian product or a stray Python-eval node without
a named, justified exemption below. Plans are obtained statically
(analysis + physical planning only); building the DataFrame does not
run the query, so the whole registry sweeps in one session.

Streaming queries are excluded: invoking their fn() drives an
availableNow stream to completion (an execution, not a plan build);
their plan discipline is covered by tests/test_streaming.py.
Iterative-driver queries (dedup_clusters & co.) do run actions while
BUILDING the result — they stay in the sweep because their per-round
plans are exactly what the audit should see.
"""

from __future__ import annotations

import pytest

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.plans import executed_plan

from .conftest import SF_SMOKE

Q = registry.load_all()

# Queries whose plans legitimately contain a BroadcastNestedLoopJoin —
# every one has a broadcast build side that is O(1)-sized by
# construction (scalar stats, literal tier tables, tiny pools). A
# BNLJ between two data-sized relations would still fail the
# CartesianProduct check? No — so keep this list REVIEWED: adding a
# name here asserts the build side is constant-bounded.
BNLJ_ALLOWED = {
    "range_join_quantity_tiers",  # 3-row literal tier table
    "bm25_topk",  # 1-row corpus stats scalar
    "hard_negative_mining",  # broadcast candidate pool, theta join
    "ann_brute_force_topk",  # intentional exact baseline, broadcast queries
    "ann_recall_report",  # ground-truth side = same broadcast-query exact scan
    "mrl_truncation_recall",  # same bounded broadcast-query exact scan, one pass
    "ann_ivf_cells",  # 16-row centroid table
    "ann_ivf_topk",  # 16-row centroid table
    "ann_ivfpq_topk",  # 16-row centroid table (coarse stage)
    # kmeans_assignments / kmeans_centroids: removed r4 — centroids
    # now ride the plan as literals (kmeans.py::_cent_literal_rows), so
    # assignment has no join node at all.
    "embedding_sq8_codes",  # broadcast 1-row quantizer scalar
    "skew_salted_hot_key_join",  # broadcast salt-range literal
    "lang_id_stopwords",  # broadcast ~3-row language/stopword list
    "region_segment_cross",  # intentional 5x5 dim-by-dim cross product
    "domain_mixture_plan",  # 1-row corpus totals
    "market_basket_pairs",  # 1-row n_orders scalar for lift
    "zone_map_pruning_audit",  # 3-row literal probe table + 1-row total
    "domain_balanced_sample",  # broadcast per-domain quotas
    "equi_width_price_histogram",  # 1-row (min, max, count) stats scalar
    "dsir_importance_weights",  # 1-row (Nt, Nr) token-total scalar
    "shuffle_skew_report",  # 1-row (n_keys, total, max) summary scalar
    "bpe_train_merges",  # 1-row merge winner + 1-row token total, x3 rounds
}

# Python-eval nodes are allowed ONLY in the explicitly-Pandas
# operator families (Arrow-batched by design, never row-at-a-time).
PYTHON_ALLOWED_MODULES = (
    "matrix_multiplication_map_reduce_gcp_spark.multimodal",
    "matrix_multiplication_map_reduce_gcp_spark.matrix",
    "matrix_multiplication_map_reduce_gcp_spark.operators.pandas_udfs",
    "matrix_multiplication_map_reduce_gcp_spark.operators.matrix_queries",
)

# Queries whose plans legitimately contain an ArrowEvalPython node:
# the Arrow numeric kernels (functions/vectors.py::cosine_arrow on
# candidate-verify stages; similarity/lsh.py::bucket_arrow on the
# narrow bucketing pass — r12) — each bit-identical to its JVM fold
# (pinned by tests/test_vectors_arrow.py) and Arrow-batched, never
# row-at-a-time. Adding a name here asserts the Python node is one of
# those kernels on a bounded stream, not arbitrary Python in a scan.
ARROW_KERNEL_ALLOWED = {
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_capped",
    "semdedup_keep_list",
    "knn_graph_lsh",
    # bucket_arrow (r12): the LSH bucketing kernel
    "ann_lsh_buckets",
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    "ann_recall_report",  # its approximate side is the bucketized path
}

# Queries whose plans legitimately contain a MapInPandas node outside
# the Pandas operator families: the Lloyd-assignment Arrow/NumPy
# integer GEMM (kmeans.py::_assign_pandas — r12 made it the production
# path for EVERY K after measuring it 3× faster than the literal fold
# even at K=8; bit-identical by integer exactness, pinned by
# tests/test_sketches_kmeans.py::test_assignment_paths_bit_identical).
# This gate was previously unchecked; adding a name here asserts the
# node is an Arrow-batched numeric kernel on a map-only pass, never
# row-at-a-time Python in a scan.
MAP_IN_PANDAS_ALLOWED = {
    "kmeans_assignments",
    "kmeans_centroids",
    "semdedup_keep_list",
    "embedding_prototypicality",
    # PQ code assignment (pq.py::_assign_codes_np — r12): one map-only
    # Arrow pass with the driver-trained bounded-sample codebook in
    # the task closure; int64 GEMMs, bit-identical to the oracle's
    # CTE chain (hash-checked at 3 SFs).
    "pq_codes",
    "ann_pq_adc_topk",
    "ann_pq_rerank_topk",
    "ann_ivfpq_topk",
    # SQ8 fused normalize→code→dot pass (quantization.py::
    # sq8_scored_arrow — r12): bounded query set + one-row scale in
    # the closure, exact int64 GEMM dots; left BNLJ_ALLOWED because
    # its plan no longer has any join at all.
    "ann_sq8_topk",
}

SWEEP = sorted(n for n in Q if not n.startswith("stream_"))


@pytest.mark.parametrize("name", SWEEP)
def test_no_scale_killers_in_plan(name, spark):
    qd = Q[name]
    plan = executed_plan(qd.fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, (
        f"{name}: cartesian product — an unbroadcast all-pairs join "
        f"cannot survive scale"
    )
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: BroadcastNestedLoopJoin outside the reviewed "
            f"allow-list — if the build side is constant-bounded, add "
            f"the name to BNLJ_ALLOWED with a justification"
        )
    mod = qd.fn.__module__
    if not mod.startswith(PYTHON_ALLOWED_MODULES):
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        if name not in ARROW_KERNEL_ALLOWED:
            assert "ArrowEvalPython" not in plan, (
                f"{name}: Pandas UDF outside the Pandas operator families "
                f"and the reviewed Arrow-kernel allow-list"
            )
        if name not in MAP_IN_PANDAS_ALLOWED:
            assert "MapInPandas" not in plan, (
                f"{name}: mapInPandas outside the Pandas operator families "
                f"and the reviewed GEMM allow-list"
            )
