"""Quality gates beyond determinism: (1) the differential harness
actually DETECTS wrong results (a gate that can't fail is no gate);
(2) approximate operators hold recall floors on corpora with planted
structure."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table

from .conftest import SF_SMOKE, assert_matches_oracle


def test_harness_detects_value_mismatch(spark, duck):
    """Feed the harness a query that's off by one row value — it must
    raise, proving the gate has teeth."""
    wrong = load_table(spark, SF_SMOKE, "region").withColumn(
        "r_regionkey",
        F.when(F.col("r_regionkey") == 0, 99).otherwise(F.col("r_regionkey")),
    )
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(wrong, "SELECT * FROM region", duck)


def test_harness_detects_count_and_schema_mismatch(spark, duck):
    r = load_table(spark, SF_SMOKE, "region")
    with pytest.raises(AssertionError, match="row count"):
        assert_matches_oracle(r.limit(3), "SELECT * FROM region", duck)
    with pytest.raises(AssertionError, match="column mismatch"):
        assert_matches_oracle(
            r.withColumnRenamed("r_name", "name"), "SELECT * FROM region", duck
        )


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """3 tight clusters of 30 vectors each: every vector's true top-5
    neighbors are in its own cluster."""
    rng = np.random.default_rng(42)
    rows = []
    for c in range(3):
        center = rng.normal(size=32)
        center /= np.linalg.norm(center)
        for i in range(30):
            v = center + rng.normal(scale=0.05, size=32)
            v /= np.linalg.norm(v)
            rows.append((c * 30 + i, v.tolist(), c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_lsh_recall_floor_on_clustered_data(spark, clustered_vectors):
    """Sign-projection LSH must keep ≥60% recall@5 vs brute force on
    tightly clustered data (random buckets would give ~5%)."""
    from matrix_multiplication_map_reduce_gcp_spark.similarity.brute_force import (
        blocked_cosine_topk,
        cosine_topk,
    )
    from matrix_multiplication_map_reduce_gcp_spark.similarity.lsh import bucketize

    queries = clustered_vectors.filter(F.col("vec_id") % 10 == 0)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(clustered_vectors, queries, k=5).collect()
    }
    bucketed = bucketize(clustered_vectors, vec_col="embedding")
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in blocked_cosine_topk(
            bucketed, "bucket", F.col("vec_id") % 10 == 0, 5
        ).collect()
    }
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.6, f"LSH recall@5 collapsed to {recall:.2f}"


def test_minhash_recall_on_planted_near_dups(spark):
    """Plant 20 near-dup pairs (1 word changed in 120) — banded MinHash
    must recover ≥80% of them while producing no pair for unrelated
    docs that share zero shingles."""
    from matrix_multiplication_map_reduce_gcp_spark.dedup.minhash import candidate_pairs

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    for p in range(20):
        words = list(rng.choice(vocab, size=120))
        twin = words.copy()
        twin[60] = "CHANGED"
        rows.append((2 * p, " ".join(words), "en", "s"))
        rows.append((2 * p + 1, " ".join(twin), "en", "s"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    pairs = {(r.doc_a, r.doc_b) for r in candidate_pairs(docs).collect()}
    planted = {(2 * p, 2 * p + 1) for p in range(20)}
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.8, f"MinHash recall collapsed to {recall:.2f}"


def test_sq8_topk_recall_floor(spark):
    """Symmetric-int8 quantized top-10 must recover ≥90% of the exact
    cosine top-10 on the sf0.01 fixture (it is 100% there today) —
    quantization is a compression lever, not a semantics change."""
    from matrix_multiplication_map_reduce_gcp_spark import registry
    from .conftest import SF_CORRECTNESS

    qs = registry.load_all()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_brute_force_topk"].fn(spark, SF_CORRECTNESS).collect()
    }
    sq8 = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_sq8_topk"].fn(spark, SF_CORRECTNESS).collect()
    }
    assert exact, "no exact neighbors — vacuous"
    recall = len(exact & sq8) / len(exact)
    assert recall >= 0.9, f"SQ8 recall collapsed to {recall:.2f}"


def test_embedding_banded_near_dup_recall_floor(spark, duck):
    """The (label, SRP-band)-blocked embedding near-dup operator must
    recover ≥80% of the exact label-blocked all-pairs result at the
    0.35 cosine floor on the real sf0.01 fixture — the banding is a
    scale optimization, not a semantics change. Also pins
    non-emptiness: a threshold query returning zero rows would be a
    vacuous pass."""
    from matrix_multiplication_map_reduce_gcp_spark import registry
    from matrix_multiplication_map_reduce_gcp_spark.functions.vectors import (
        sql_cosine_rounded,
    )
    from .conftest import SF_CORRECTNESS

    cos = sql_cosine_rounded("a.embedding", "b.embedding")
    exact = {
        (a, b)
        for a, b, _ in duck.sql(
            f"""SELECT a.vec_id, b.vec_id, {cos} FROM embeddings a
                JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
                WHERE {cos} >= 0.35"""
        ).fetchall()
    }
    got = {
        (r.vec_a, r.vec_b)
        for r in registry.load_all()["embedding_near_dup_pairs"]
        .fn(spark, SF_CORRECTNESS)
        .collect()
    }
    assert exact, "fixture produced no exact near-dup pairs — vacuous gate"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"banded near-dup recall collapsed to {recall:.2f}"
    assert not (got - exact), "banded result contains pairs below the floor"


def test_pq_rerank_recall_floor(spark):
    """ADC-shortlist + exact-rerank PQ search must recover ≥80% of the
    exact top-10 on the sf0.01 fixture (0.86 today). Pure ADC is the
    compressed-domain pruning stage, so its own recall is allowed to
    be modest — but the shortlist it feeds the reranker must not
    collapse."""
    from matrix_multiplication_map_reduce_gcp_spark import registry
    from .conftest import SF_CORRECTNESS

    qs = registry.load_all()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_brute_force_topk"].fn(spark, SF_CORRECTNESS).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_pq_rerank_topk"].fn(spark, SF_CORRECTNESS).collect()
    }
    assert exact, "no exact neighbors — vacuous"
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.8, f"PQ rerank recall collapsed to {recall:.2f}"


def test_ivfpq_recall_floor(spark):
    """The full IVF-PQ stack (cells → ADC → rerank) must recover ≥80%
    of the exact top-10 at nprobe=3 of 16 cells (0.90 today)."""
    from matrix_multiplication_map_reduce_gcp_spark import registry
    from .conftest import SF_CORRECTNESS

    qs = registry.load_all()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_brute_force_topk"].fn(spark, SF_CORRECTNESS).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_ivfpq_topk"].fn(spark, SF_CORRECTNESS).collect()
    }
    assert exact, "no exact neighbors — vacuous"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"IVF-PQ recall collapsed to {recall:.2f}"


def test_knn_graph_recall_floor_on_clustered_data(spark):
    """kNN-graph construction must recover real neighbor structure:
    on 4 planted 64-dim clusters (noise scale 0.03 → intra-cluster
    cos ≈ 0.97) the multi-probe graph holds mean recall@5 ≥ 0.8 vs
    exact, and essentially every edge stays inside its cluster. (The
    shipped fixture's embeddings are unstructured, so recall there is
    meaningless — which is precisely what ann_recall_report exists to
    measure in production.)"""
    import numpy as np

    from matrix_multiplication_map_reduce_gcp_spark.similarity.queries import knn_graph

    rng = np.random.default_rng(7)
    rows = []
    for c in range(4):
        center = rng.normal(size=64)
        center /= np.linalg.norm(center)
        for i in range(25):
            v = center + rng.normal(scale=0.03, size=64)
            v /= np.linalg.norm(v)
            rows.append((c * 25 + i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    edges = knn_graph(df, 5).collect()
    got: dict[int, set[int]] = {}
    for r in edges:
        got.setdefault(r.src, set()).add(r.dst)

    V = np.array([r[1] for r in rows])
    ids = [r[0] for r in rows]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    np.fill_diagonal(S, -2)
    recalls = []
    for i, vid in enumerate(ids):
        exact = {
            ids[j]
            for j in sorted(
                range(len(ids)), key=lambda j: (-round(S[i, j], 6), ids[j])
            )[:5]
        }
        recalls.append(len(got.get(vid, set()) & exact) / 5)
    assert sum(recalls) / len(recalls) >= 0.8
    same = sum(1 for r in edges if r.src // 25 == r.dst // 25) / len(edges)
    assert same >= 0.98


def test_prototypicality_drop_tail_is_farthest(spark):
    """Per cell, every dropped vector must be at least as far from the
    centroid as every kept one, and the drop fraction must be roughly
    the configured 10% tail."""
    from matrix_multiplication_map_reduce_gcp_spark import registry

    rows = registry.load_all()["embedding_prototypicality"].fn(
        spark, SF_SMOKE
    ).collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    n_drop = sum(1 for r in rows if r.verdict == "drop")
    assert 0 < n_drop < 0.25 * len(rows)
    for cell, members in by_cell.items():
        kept_max = max(
            (r.dist for r in members if r.verdict == "keep"), default=-1
        )
        for r in members:
            if r.verdict == "drop":
                assert r.dist >= kept_max, (cell, r)


def test_knn_graph_recall_holds_on_adaptive_planes_path(spark):
    """The corpus-adaptive plane count (lsh.adaptive_planes) kicks in
    above 8192 vectors — a path no small fixture exercises. On 9216
    vectors (36 planted clusters x 256, noise 0.03) the plane count
    must rise above the 8-plane floor AND the graph must still recover
    neighbor structure: sampled mean recall@5 >= 0.8 vs exact, edges
    overwhelmingly intra-cluster."""
    import numpy as np

    from matrix_multiplication_map_reduce_gcp_spark.similarity.lsh import adaptive_planes
    from matrix_multiplication_map_reduce_gcp_spark.similarity.queries import knn_graph

    n_clusters, per = 36, 256
    n = n_clusters * per
    assert adaptive_planes(n) > 8  # the test must exercise the adaptive path

    rng = np.random.default_rng(13)
    V = np.empty((n, 64))
    for c in range(n_clusters):
        center = rng.normal(size=64)
        center /= np.linalg.norm(center)
        block = center + rng.normal(scale=0.03, size=(per, 64))
        V[c * per : (c + 1) * per] = block / np.linalg.norm(
            block, axis=1, keepdims=True
        )
    df = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    edges = knn_graph(df, 5).collect()
    got: dict[int, set[int]] = {}
    for r in edges:
        got.setdefault(r.src, set()).add(r.dst)

    sample = rng.choice(n, size=150, replace=False)
    recalls = []
    for i in sample:
        sims = V @ V[i]
        sims[i] = -2
        exact = set(np.argsort(-np.round(sims, 6), kind="stable")[:5].tolist())
        recalls.append(len(got.get(int(i), set()) & exact) / 5)
    assert sum(recalls) / len(recalls) >= 0.8
    same = sum(1 for r in edges if r.src // per == r.dst // per) / len(edges)
    assert same >= 0.95


@pytest.fixture(scope="module")
def replicated_corpus(tmp_path_factory):
    """Factor-6 key-shifted replica of sf0.001 (scripts/gen_scale.py):
    every document/embedding becomes a planted duplicate cluster of 6
    identical members — the corpus shape whose quadratic pair volume
    motivated the capped variants (VERDICT r5 #7)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    out = tmp_path_factory.mktemp("capped_probe")
    repo = Path(__file__).resolve().parent.parent
    subprocess.run(
        [_sys.executable, str(repo / "scripts" / "gen_scale.py"),
         "--src", "/root/testdata/sf0.001", "--out", str(out),
         "--factor", "6"],
        check=True, capture_output=True,
    )
    return str(out)


def _connected(members, pairs):
    """Union-find connectivity of ``members`` under ``pairs``."""
    parent = {m: m for m in members}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    return len({find(m) for m in members}) == 1


def test_capped_pair_variants_bound_output_keep_cluster_recall(
    spark, replicated_corpus
):
    """The top-k-per-endpoint cap must (1) bound output at k pairs per
    doc, (2) bind on the planted 6-clusters (k=4 < 5 true neighbors),
    (3) keep PAIR recall ≥0.9 on planted duplicates (analysis: each
    cluster loses exactly the pairs where BOTH endpoints' budgets are
    exhausted by smaller ids — 1 of 15 at g=6, k=4), and (4) keep
    CLUSTER recall at 1.0 — every planted cluster stays fully
    connected through its surviving pairs, which is what the
    connected-components dedup downstream actually consumes."""
    from matrix_multiplication_map_reduce_gcp_spark import registry
    from matrix_multiplication_map_reduce_gcp_spark.dedup.queries import PAIR_TOP_K

    STRIDE = 1_000_000_000  # scripts/gen_scale.py key-shift stride
    qs = registry.load_all()
    for full_name, capped_name, ida, idb in (
        ("embedding_near_dup_pairs", "embedding_near_dup_pairs_capped",
         "vec_a", "vec_b"),
        ("levenshtein_near_dup_pairs", "levenshtein_near_dup_pairs_capped",
         "doc_a", "doc_b"),
    ):
        full = {
            (r[ida], r[idb])
            for r in qs[full_name].fn(spark, replicated_corpus).collect()
        }
        capped = {
            (r[ida], r[idb])
            for r in qs[capped_name].fn(spark, replicated_corpus).collect()
        }
        n_docs = len({d for p in full for d in p})
        assert capped <= full, f"{capped_name}: cap emitted non-full pairs"
        assert len(capped) <= PAIR_TOP_K * n_docs
        assert len(capped) < len(full), f"{capped_name}: cap never bound"
        planted_full = {p for p in full if p[0] % STRIDE == p[1] % STRIDE}
        planted_capped = {p for p in capped if p[0] % STRIDE == p[1] % STRIDE}
        assert planted_full, f"{full_name}: no planted pairs — vacuous"
        recall = len(planted_capped) / len(planted_full)
        assert recall >= 0.9, f"{capped_name}: planted-pair recall {recall:.2f}"
        clusters: dict[int, set[int]] = {}
        for a, b in planted_full:
            clusters.setdefault(a % STRIDE, set()).update((a, b))
        for base, members in clusters.items():
            kept = [p for p in planted_capped
                    if p[0] % STRIDE == base]
            assert _connected(members, kept), (
                f"{capped_name}: planted cluster {base} disconnected"
            )


def test_capped_variants_hold_sf01_recall_floors(spark):
    """VERDICT r8 #4: the capped production variants' recall against
    their exact baselines, measured on the REAL sf0.1 corpus (not the
    planted-replica fixture above), must never regress below the
    floors measured when the cap shipped. The sf0.1 similarity profile
    matters: every embedding pair sits in the LOOSE 0.35-0.6 cosine
    band (no near-exact stratum exists — the corpus has no duplicate
    embeddings), which is exactly where the sorted-neighborhood cap is
    designed to trade recall for bounded work, so its overall floor is
    low (0.14) BY DESIGN; the levenshtein capped variant is perfect on
    the near-exact stratum (edit_distance <= 20) and holds 0.95
    cluster survival. Precision is 1.0 for both: every capped pair
    must also be a baseline pair."""
    import os

    from matrix_multiplication_map_reduce_gcp_spark import registry

    # ADVICE r9: resolve via the env convention the bench harness uses
    # and SKIP (not error) on hosts without the driver-generated sf0.1
    # corpus — the floor gate documents machine state, it shouldn't
    # masquerade as a code failure where the fixture is absent.
    SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(SF01):
        pytest.skip(f"sf0.1 corpus not present at {SF01}")
    qs = registry.load_all()

    # --- embedding family ---
    emb_full = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in qs["embedding_near_dup_pairs"].fn(spark, SF01).collect()
    }
    emb_capped = {
        (r.vec_a, r.vec_b)
        for r in qs["embedding_near_dup_pairs_capped"].fn(spark, SF01).collect()
    }
    assert emb_capped <= set(emb_full), "capped emitted a non-baseline pair"
    assert emb_full, "baseline found no pairs at sf0.1 — vacuous gate"
    assert len(emb_capped) / len(emb_full) >= 0.14  # measured 0.142 (r9)
    # If the corpus ever grows a near-exact stratum, the cap must be
    # near-perfect there (the design's whole claim).
    near_exact = {p for p, c in emb_full.items() if c >= 0.9}
    if near_exact:
        assert len(near_exact & emb_capped) / len(near_exact) >= 0.9

    # --- levenshtein family ---
    lev_full = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in qs["levenshtein_near_dup_pairs"].fn(spark, SF01).collect()
    }
    lev_capped = {
        (r.doc_a, r.doc_b)
        for r in qs["levenshtein_near_dup_pairs_capped"].fn(spark, SF01).collect()
    }
    assert lev_capped <= set(lev_full), "capped emitted a non-baseline pair"
    strict = {p for p, d in lev_full.items() if d <= 20}
    assert strict, "no near-exact levenshtein stratum at sf0.1 — vacuous"
    assert len(strict & lev_capped) / len(strict) >= 0.95  # measured 1.0 (r9)
    assert len(lev_capped) / len(lev_full) >= 0.55  # measured 0.596 (r9)

    # Cluster survival: a baseline cluster is "found" if at least one
    # of its pairs survives the cap (connected-components downstream
    # still merges those docs with the cluster's representative).
    def clusters(pairs):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        out: dict[int, set[int]] = {}
        for n in list(parent):
            out.setdefault(find(n), set()).add(n)
        return list(out.values())

    lev_cl = clusters(set(lev_full))
    survived = sum(
        1 for c in lev_cl if any(a in c and b in c for a, b in lev_capped)
    )
    assert survived / len(lev_cl) >= 0.9  # measured 60/63 = 0.952 (r9)
