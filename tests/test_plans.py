"""Plan-quality audits — the 100 TB discipline, enforced in CI:
pushdown reaches the scan, scans prune columns, dim joins broadcast,
hot paths stay in whole-stage codegen, top-k never full-sorts."""

from __future__ import annotations

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.plans import (
    executed_plan,
    has_broadcast_hash_join,
    has_pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)

from .conftest import SF_SMOKE

Q = registry.load_all()


def test_filter_pushdown_reaches_parquet(spark):
    df = Q["pricing_summary"].fn(spark, SF_SMOKE)
    assert has_pushed_filters(df, "IsNotNull(l_shipdate)", "LessThanOrEqual(l_shipdate")


def test_column_pruning_on_scan(spark):
    """pricing_summary touches 7 of lineitem's 11 columns — the scan
    must not read the rest."""
    df = Q["pricing_summary"].fn(spark, SF_SMOKE)
    schemas = read_schema_columns(df)
    assert schemas, "no parquet ReadSchema found"
    for cols in schemas:
        assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
        assert len(cols) <= 7


def test_dim_joins_broadcast(spark):
    for name in ("brand_revenue_broadcast", "region_nation_revenue", "shipping_priority"):
        assert has_broadcast_hash_join(Q[name].fn(spark, SF_SMOKE)), name


def test_topk_uses_take_ordered(spark):
    plan = executed_plan(Q["top_orders"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_matmul_no_cartesian(spark):
    """The flagship must be an equi-join + hash agg — never a
    cartesian/nested-loop (the reference's replication-mapper shape)."""
    plan = executed_plan(Q["matmul"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "HashAggregate" in plan


def test_hot_paths_have_codegen(spark):
    for name in ("pricing_summary", "matmul", "json_extraction"):
        assert whole_stage_codegen_spans(Q[name].fn(spark, SF_SMOKE)) >= 1, name


def test_r2_operators_no_cartesian(spark):
    """Round-2 additions must keep the banded/broadcast join shape:
    candidate generation never runs an unbroadcast all-pairs product
    that would explode at 100 TB. Two BroadcastNestedLoopJoins are
    intended shapes and allowed by name: hard_negative_mining's theta
    join (label !=) streams the corpus against a broadcast pool, and
    bm25_topk pins a ONE-row corpus-stats scalar to every posting."""
    for name in ("sorted_neighborhood_pairs", "triangle_count_suppliers"):
        plan = executed_plan(Q[name].fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name
    for name in ("bm25_topk", "hard_negative_mining"):
        plan = executed_plan(Q[name].fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" in plan, name  # broadcast build side


def test_r2_operators_broadcast_small_sides(spark):
    """The query set (bm25) and the co-occurrence edge list (triangle
    counting) are small by construction — they must ship as broadcast
    hash joins, not shuffle the corpus."""
    for name in ("bm25_topk", "triangle_count_suppliers"):
        assert has_broadcast_hash_join(Q[name].fn(spark, SF_SMOKE)), name


def test_pq_plans_broadcast_only(spark):
    """PQ training/assignment/ADC must be broadcast-hash-join shaped
    end to end: the corpus never cross-joins and never leaves the JVM."""
    for name in ("pq_codes", "ann_pq_adc_topk", "ann_pq_rerank_topk",
                 "ann_ivfpq_topk"):
        plan = executed_plan(Q[name].fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        if name != "ann_ivfpq_topk":
            # ivfpq's coarse-cell stage crossJoins the broadcast
            # 16-row centroid table (ivf.assign_cells's shape) —
            # a scalar-sized BNLJ build side, not a data product.
            assert "BroadcastNestedLoop" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_no_python_udfs_in_relational_paths(spark):
    """Relational + dedup queries must stay JVM-side (Python only in
    the explicitly-Pandas multimodal/block operators)."""
    for name in ("pricing_summary", "minhash_lsh_pairs", "simhash_fingerprints",
                 "ann_brute_force_topk", "lang_id_stopwords"):
        plan = executed_plan(Q[name].fn(spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_market_basket_prune_broadcasts(spark):
    """The A-priori frequent-item prune must reach the basket rows as
    a BROADCAST hash join (map-side), and the quadratic pair step must
    be an EQUI-join on the basket key — never a cartesian. (At the
    smoke SF, AQE legitimately broadcasts the tiny pair join too, so
    the pin is equi-join-on-l_orderkey, not the physical strategy.)"""
    plan = executed_plan(Q["market_basket_pairs"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Join [l_orderkey" in plan  # the pair step keyed on the basket


def test_incident_interval_join_is_equi(spark):
    """The interval-overlap join must plan as an EQUI-join on the epoch
    bin (+ residual filter) — the theta formulation would be a
    nested-loop over |errors| x |events|."""
    plan = executed_plan(Q["incident_impact_events"].fn(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Join") >= 2  # bin equi-join + zero-impact left join


def test_forward_asof_single_sort_per_key(spark):
    """The forward as-of must be the union-sort shape: exactly ONE
    window sort over the unioned stream, no join node at all."""
    plan = executed_plan(Q["asof_forward_click_to_purchase"].fn(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_lm_scoring_has_no_model_join(spark):
    """The corpus-LM scorer must ride windows, not materialize/join a
    model table: no join node anywhere in the plan."""
    plan = executed_plan(Q["lm_bigram_quality_scores"].fn(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count("Window") == 2  # bigram count + history count


def test_snapshot_diff_shuffles_fingerprints_not_rows(spark):
    """The CDC diff's join must be a key equi-join (SMJ/SHJ after the
    two snapshot projections) and the scan must prune to the key +
    fingerprint columns only."""
    df = Q["snapshot_diff_orders"].fn(spark, SF_SMOKE)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    for cols in read_schema_columns(df):
        assert "o_totalprice" not in cols and "o_orderdate" not in cols, cols


def test_path_trigrams_topk_take_ordered(spark):
    """Path-mining top-k must end in TakeOrderedAndProject (constant
    driver memory), with the trigram build as one shared window."""
    plan = executed_plan(Q["event_path_trigrams_topk"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Window") == 1


def test_dsir_model_join_broadcasts(spark):
    """DSIR's per-token scoring join against the B-row log-ratio model
    must be a broadcast hash join — the model travels to the tokens,
    the token stream never shuffles for the join."""
    plan = executed_plan(Q["dsir_importance_weights"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semdedup_pair_join_is_equi(spark):
    """SemDeDup's candidate generation must be an equi-join on the
    cell id (never a cross product), and the drop-list flag join must
    broadcast."""
    plan = executed_plan(Q["semdedup_keep_list"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_histogram_scan_prunes_to_price(spark):
    """Both histogram passes must read ONLY l_extendedprice."""
    df = Q["equi_width_price_histogram"].fn(spark, SF_SMOKE)
    for cols in read_schema_columns(df):
        assert cols == ["l_extendedprice"], cols


def test_attribution_single_window_no_join(spark):
    """Last-touch attribution fuses LOCF into the event stream: one
    window pass, zero joins."""
    plan = executed_plan(Q["attribution_last_touch"].fn(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_skew_report_topk_take_ordered(spark):
    """The heavy-key top-10 must be per-partition heaps
    (TakeOrderedAndProject), never a global sort of the key table."""
    plan = executed_plan(Q["shuffle_skew_report"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_join_view_ivm_all_equi_joins(spark):
    """All four IVM delta joins must be key equi-joins — no nested
    loop anywhere in the maintained-view plan."""
    plan = executed_plan(Q["join_view_ivm"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
