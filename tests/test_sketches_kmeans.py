"""Behavioral tests for the deterministic sketches (count-min, Bloom)
and the integer-exact k-means trainer — properties the hash-gate can't
express: sketch error bounds, no-false-negative guarantees, Lloyd
monotonicity. Cross-engine exactness itself is covered by the
parametrized registry-oracle test."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    bloom_bitmap,
)
from matrix_multiplication_map_reduce_gcp_spark.similarity import kmeans

from .conftest import SF_CORRECTNESS


def test_cms_never_undercounts_and_bounds_error(spark):
    """CMS guarantees est >= exact; with depth 4 x width 512 over
    sf0.01 lineitem the expected overcount per cell is N/W — assert
    the top-20 estimates stay within 3x that slack."""
    qs = registry.load_all()
    rows = qs["cms_heavy_hitters"].fn(spark, SF_CORRECTNESS).collect()
    assert len(rows) == 20
    n_total = (
        load_table(spark, SF_CORRECTNESS, "lineitem").count()
    )
    slack = 3 * n_total / CMS_WIDTH
    for r in rows:
        assert r.overcount >= 0, f"CMS undercounted {r.l_partkey}"
        assert r.cms_est >= r.exact_cnt
        assert r.overcount <= slack, (
            f"overcount {r.overcount} beyond 3x expected collision mass "
            f"{slack:.0f} for key {r.l_partkey}"
        )


def test_bloom_has_no_false_negatives(spark):
    """Every exact match must pass the bloom filter: per status,
    n_bloom_pass == n_exact + n_false_positive, and the false-positive
    rate over non-members stays under 5% (4096 bits / 3 hashes over
    ~150 build keys is far below saturation)."""
    qs = registry.load_all()
    rows = qs["bloom_join_prune"].fn(spark, SF_CORRECTNESS).collect()
    assert rows
    for r in rows:
        assert r.n_bloom_pass == r.n_exact + r.n_false_positive
        non_members = r.n_probe - r.n_exact
        if non_members:
            assert r.n_false_positive / non_members < 0.05


def test_bloom_bitmap_membership_complete(spark):
    """Direct unit check on the bitmap builder: every build key's 3
    probe positions are set (the filter can never reject a member)."""
    c = load_table(spark, SF_CORRECTNESS, "customer")
    build = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    words = {
        r.word: r.bits for r in bloom_bitmap(build, "c_custkey").collect()
    }
    import hashlib

    for r in build.collect():
        h = hashlib.md5(f"c|{r.c_custkey}".encode()).hexdigest()
        for s in range(3):
            p = int(h[8 * s : 8 * s + 8], 16) % 4096
            assert words.get(p // 32, 0) & (1 << (p % 32)), (
                f"member bit {p} not set"
            )


def test_kmeans_iteration_improves_objective(spark):
    """Lloyd's algorithm never increases the within-cluster objective:
    total squared distance after round 2 <= after round 1 (both exact
    bigints, so the comparison is noise-free)."""
    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = kmeans.quantized_dims(e)
    cents = q.filter(F.col("vec_id") < kmeans.K).select(
        F.col("vec_id").alias("k"), "dim", F.col("qx").alias("c")
    )
    a1 = kmeans.assign(q, cents)
    obj1 = a1.agg(F.sum("dist")).collect()[0][0]
    c1 = kmeans.update(q, a1)
    a2 = kmeans.assign(q, c1)
    obj2 = a2.agg(F.sum("dist")).collect()[0][0]
    assert obj2 <= obj1, f"objective rose: {obj1} -> {obj2}"


def test_kmeans_all_clusters_populated_and_assignments_total(spark):
    qs = registry.load_all()
    a = qs["kmeans_assignments"].fn(spark, SF_CORRECTNESS)
    n_vecs = load_table(spark, SF_CORRECTNESS, "embeddings").count()
    per = {r.cluster: r.n for r in a.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert sum(per.values()) == n_vecs
    assert len(per) == kmeans.K, f"empty clusters: {set(range(kmeans.K)) - set(per)}"


def test_levenshtein_dedup_catches_planted_near_dups(spark, tmp_path):
    """Plant two documents that differ by a 3-char edit (same lang,
    same length bucket) in a minimal documents.parquet; the fuzzy-dedup
    query must emit exactly that pair with the exact distance."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    edited = base.replace("dog", "cat")  # 3 substitutions, same length
    rows = [
        (1, base, "en", "srcA", len(base)),
        (2, edited, "en", "srcA", len(edited)),
        (3, "completely different content about spark query engines at scale", "en", "srcA", 64),
        (4, base, "de", "srcB", len(base)),  # other lang: other block
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from matrix_multiplication_map_reduce_gcp_spark import registry

    qs = registry.load_all()
    out = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in qs["levenshtein_near_dup_pairs"].fn(spark, str(tmp_path)).collect()
    }
    assert out.get((1, 2)) == 3, f"planted pair missing/wrong: {out}"
    assert (1, 4) not in out and (2, 4) not in out, "cross-lang block leak"


def test_assignment_paths_bit_identical(spark):
    """The two Lloyd-assignment implementations — the literal fold
    (pure JVM, the r1-r11 small-K production path, now the reference
    implementation) and the Arrow/NumPy integer GEMM (the r12
    production path for every K) — must return IDENTICAL
    (vec_id, k, dist) rows for the same centroids, including the
    (dist, k) tie-break. Integer arithmetic makes this exact, so the
    test is equality, not tolerance."""
    from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
    from matrix_multiplication_map_reduce_gcp_spark.similarity import kmeans

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qarr = kmeans.quantized_arrays(e)
    cent_arr = qarr.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("k"), F.col("qv").alias("cv")
    )
    rows = sorted(cent_arr.collect(), key=lambda r: r.k)
    via_pandas = {
        (r.vec_id): (r.k, r.dist)
        for r in kmeans.assign_arrays(qarr, cent_arr).collect()
    }
    via_fold = {
        (r.vec_id): (r.k, r.dist)
        for r in kmeans._assign_fold_literal(qarr, rows).collect()
    }
    assert via_pandas == via_fold
