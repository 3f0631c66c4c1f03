"""Behavioral pins for the round-5 operators: k-core peeling
invariants on the mutual-top-m graph, source-level MinHash sketch
identities, and epoch-shuffle manifest conservation/permutation laws.
The registry oracle suite proves engine parity; these tests pin the
SEMANTICS the parity check alone would not catch (e.g. a wrong-but-
mirrored peel order would still match its own oracle).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.operators.pagerank import (
    KCORE_K,
    KCORE_TOP_M,
)
from matrix_multiplication_map_reduce_gcp_spark.text.curation import N_SHARDS

from .conftest import SF_CORRECTNESS

QS = registry.load_all()


# ---- k_core_suppliers -----------------------------------------------------


def test_k_core_survivors_and_bounds(spark):
    """Every surviving node's final degree is bounded by the top-m
    sparsifier (deg <= m), and survivors must have held degree >= k at
    the round they survived — after 3 peels every remaining node had
    >= k partners in the round-2 graph, so the round-3 degree can dip
    below k only by losing neighbors in the LAST peel (at most m - k
    of them), never below k - (m - k) ... the checkable invariant is
    deg <= m and node count strictly <= the unpeeled graph's."""
    out = QS["k_core_suppliers"].fn(spark, SF_CORRECTNESS).collect()
    assert len(out) > 0  # sf0.01 peels 100 -> 80, never empty
    for r in out:
        assert 1 <= r.degree <= KCORE_TOP_M
    # survivors are a strict subset at this fixture (100 -> 80)
    n_nodes = (
        spark.read.parquet(f"{SF_CORRECTNESS}/lineitem.parquet")
        .select("l_suppkey")
        .distinct()
        .count()
    )
    assert len(out) < n_nodes


def test_k_core_planted_graph(spark, tmp_path):
    """Planted structure: a (k+2)-clique survives peeling at threshold
    k while a pendant path hanging off it is peeled away. Orders are
    the edge gadgets: one order shared by two suppliers = one edge
    with co-order weight >= 1; the clique pair orders repeat 6x so
    every clique edge out-ranks stray path edges in the top-m window."""
    clique = list(range(1, KCORE_K + 3))  # k+2 nodes: degree k+1 inside
    path = [100, 101, 102]
    rows = []
    ok = 0
    for rep in range(6):
        for i in clique:
            for j in clique:
                if i < j:
                    ok += 1
                    rows.append((ok, i))
                    rows.append((ok, j))
    chain = list(zip([clique[0]] + path[:-1], path))
    for u, v in chain:
        ok += 1
        rows.append((ok, u))
        rows.append((ok, v))
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/lineitem.parquet")
    out = QS["k_core_suppliers"].fn(spark, str(tmp_path)).collect()
    survivors = {r.suppkey for r in out}
    assert survivors == set(clique)
    for r in out:
        assert r.degree == KCORE_K + 1  # intact clique: all edges kept


# ---- source_minhash_similarity --------------------------------------------


def test_source_minhash_all_pairs_and_range(spark):
    """The member-index join must emit EVERY source pair (even
    0-agreement ones — a missing pair reads as 'identical corpora
    never compared'), n_agree in [0, 8], est = n_agree/8 exactly."""
    out = QS["source_minhash_similarity"].fn(spark, SF_CORRECTNESS).collect()
    n_src = (
        spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(out) == n_src * (n_src - 1) // 2
    for r in out:
        assert 0 <= r.n_agree <= 8
        assert r.est_jaccard == r.n_agree / 8
        assert r.source_a < r.source_b


def test_source_minhash_identical_sources_agree_fully(spark, tmp_path):
    """Two sources holding the same document set must agree on every
    signature member (est_jaccard = 1.0); a third disjoint-vocabulary
    source must agree on none (8 independent 31-bit collisions have
    ~2^-200 odds — a failure here is a logic bug, not bad luck)."""
    texts_ab = [f"alpha{i} beta{i} gamma{i} delta{i} eps{i}" for i in range(20)]
    texts_c = [f"zulu{i} york{i} xray{i} whis{i} vic{i}" for i in range(20)]
    doc_id, text, src = [], [], []
    i = 0
    for s, texts in (("a", texts_ab), ("b", texts_ab), ("c", texts_c)):
        for t in texts:
            doc_id.append(i)
            text.append(t)
            src.append(s)
            i += 1
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "text": pa.array(text),
            "lang": pa.array(["en"] * len(text)),
            "source": pa.array(src),
            "n_chars": pa.array([len(t) for t in text], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")
    out = {
        (r.source_a, r.source_b): r
        for r in QS["source_minhash_similarity"].fn(spark, str(tmp_path)).collect()
    }
    assert out[("a", "b")].est_jaccard == 1.0
    assert out[("a", "c")].n_agree == 0
    assert out[("b", "c")].n_agree == 0


# ---- epoch_shuffle_shards -------------------------------------------------


def test_epoch_shuffle_conservation_and_determinism(spark):
    """Shard doc counts and char mass must conserve the corpus totals
    (a dropped or double-assigned doc is a training-data bug), shard
    ids cover [0, N_SHARDS), and the manifest is bit-stable across
    independent runs (the determinism a resumable dataloader needs)."""
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    total_docs = docs.count()
    total_chars = docs.agg(F.sum("n_chars").cast("bigint")).collect()[0][0]
    run1 = {r.shard: r for r in QS["epoch_shuffle_shards"].fn(spark, SF_CORRECTNESS).collect()}
    run2 = {r.shard: r for r in QS["epoch_shuffle_shards"].fn(spark, SF_CORRECTNESS).collect()}
    assert set(run1) <= set(range(N_SHARDS))
    assert sum(r.n_docs for r in run1.values()) == total_docs
    assert sum(r.char_mass for r in run1.values()) == total_chars
    for s, r in run1.items():
        assert r.first_key <= r.last_key
        assert run2[s] == r


# ---- leakage_safe_split ---------------------------------------------------


def test_leakage_safe_split_no_pair_straddles(spark):
    """THE property the operator exists for: no LSH candidate pair
    (near-dup) may straddle splits — both endpoints always land in
    the same split. Also pins full coverage (every doc assigned
    exactly one split) and all three splits non-empty at sf0.01."""
    from matrix_multiplication_map_reduce_gcp_spark.dedup.minhash import candidate_pairs

    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    split = {r.doc_id: r.split for r in QS["leakage_safe_split"].fn(spark, SF_CORRECTNESS).collect()}
    assert len(split) == docs.count()
    assert set(split.values()) == {"train", "val", "test"}
    pairs = candidate_pairs(docs.select("doc_id", "text")).collect()
    assert len(pairs) > 0  # the fixture has near-dups; vacuous otherwise
    for p in pairs:
        assert split[p.doc_a] == split[p.doc_b], (p.doc_a, p.doc_b)


def test_epoch_shuffle_manifest_validates_written_layout(spark, tmp_path):
    """The manifest's write-side contract, end to end: materialize the
    epoch as parquet partitioned by shard with each shard LOCALLY
    sorted by key (no global sort anywhere), then re-derive every
    manifest column from the written files — counts, char mass, key
    range, and the order-independent checksum must all match, and each
    shard's rows must come back key-sorted (what a resumable
    dataloader assumes when it seeks)."""
    from pyspark.sql import functions as F
    from matrix_multiplication_map_reduce_gcp_spark.text.curation import epoch_key_cols

    manifest = {
        r.shard: r for r in QS["epoch_shuffle_shards"].fn(spark, SF_CORRECTNESS).collect()
    }
    d = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    key, shard, member_h = epoch_key_cols()
    laid = (
        d.withColumn("key", key)
        .withColumn("shard", shard)
        .withColumn("member_h", member_h)
        .repartition("shard")
        # (shard, key), not key alone: the partitioned write itself
        # requires rows clustered by the partition column and will
        # insert its own (unstable) sort on `shard` if the incoming
        # order doesn't already satisfy it — which would scramble the
        # key order this test pins.
        .sortWithinPartitions("shard", "key")
    )
    out = f"{tmp_path}/epoch1"
    laid.write.partitionBy("shard").parquet(out)
    back = spark.read.parquet(out)
    derived = {
        r.shard: r
        for r in back.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("char_mass"),
            F.min("key").alias("first_key"),
            F.max("key").alias("last_key"),
            F.sum("member_h").alias("key_checksum"),
        )
        .collect()
    }
    assert set(derived) == set(manifest)
    for s, m in manifest.items():
        g = derived[s]
        assert (g.n_docs, g.char_mass, g.first_key, g.last_key, g.key_checksum) == (
            m.n_docs, m.char_mass, m.first_key, m.last_key, m.key_checksum
        ), s
    # per-shard files are key-sorted (local sort survived the write)
    import glob as _glob
    import pyarrow.parquet as _pq

    for part_dir in _glob.glob(f"{out}/shard=*"):
        for f in _glob.glob(f"{part_dir}/*.parquet"):
            keys = _pq.read_table(f, columns=["key"]).column("key").to_pylist()
            assert keys == sorted(keys), f
