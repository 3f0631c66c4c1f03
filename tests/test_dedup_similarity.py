"""Behavioral tests for dedup + similarity on CONSTRUCTED corpora with
known near-duplicates — the fixture documents are all unique, so these
prove the operators actually detect what they claim to detect."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.dedup.jaccard import jaccard_pairs
from matrix_multiplication_map_reduce_gcp_spark.dedup.minhash import candidate_pairs
from matrix_multiplication_map_reduce_gcp_spark.dedup.simhash import hamming_pairs, simhash
from matrix_multiplication_map_reduce_gcp_spark.similarity.brute_force import cosine_topk
from matrix_multiplication_map_reduce_gcp_spark.similarity.lsh import bucketize

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree "
    "near the quiet river that flows through the green valley"
)


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    # doc 0/1: near-identical (one word changed); doc 2: copy of 0;
    # docs 3..9: unrelated word soups.
    rng = np.random.default_rng(7)
    vocab = BASE.split()
    rows = [
        (0, BASE, "en", "srcA"),
        (1, BASE.replace("quick", "swift"), "en", "srcA"),
        (2, BASE, "en", "srcA"),
    ]
    for i in range(3, 10):
        words = rng.permutation(vocab).tolist()
        rows.append((i, " ".join(words), "en", "srcA"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_minhash_lsh_finds_near_dups(near_dup_docs):
    pairs = {(r.doc_a, r.doc_b) for r in candidate_pairs(near_dup_docs).collect()}
    assert (0, 2) in pairs  # exact dup always collides
    assert (0, 1) in pairs or (1, 2) in pairs  # near-dup caught by some band
    # permuted word-soup docs share no 3-gram shingles with the base
    assert all(a >= 3 or b <= 2 for a, b in pairs if (a, b) not in {(0, 1), (0, 2), (1, 2)})


def test_jaccard_scores_order(near_dup_docs):
    jp = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(near_dup_docs, threshold=0.0).collect()
    }
    assert jp[(0, 2)] == 1.0
    assert 0.5 < jp[(0, 1)] < 1.0


def test_jaccard_stop_shingle_cap_kills_quadratic_group(spark):
    """Scale guard: a stop-shingle shared by every doc in a block must
    NOT manufacture O(n²) candidate pairs. 40 docs share exactly one
    3-gram ('common shared prefix'); the rest of each doc is unique.
    Uncapped, the inverted-index self-join emits all C(40,2)=780 pairs;
    with the df cap the stop-shingle is dropped pre-join and no pair
    survives."""
    rows = [
        (i, f"common shared prefix u{i}a u{i}b u{i}c u{i}d u{i}e", "en", "srcA")
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    uncapped = jaccard_pairs(docs, threshold=0.0, max_df=10_000).count()
    capped = jaccard_pairs(docs, threshold=0.0, max_df=10).count()
    assert uncapped == 40 * 39 // 2
    assert capped == 0


def test_jaccard_cap_preserves_true_near_dups(near_dup_docs):
    """The df cap must not change scores for genuinely similar docs
    when no shingle exceeds the cap (10 docs here, default cap 100)."""
    jp = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(near_dup_docs, threshold=0.0).collect()
    }
    assert jp[(0, 2)] == 1.0
    assert 0.5 < jp[(0, 1)] < 1.0


def test_simhash_hamming_close_for_near_dups(spark, near_dup_docs):
    fp = simhash(near_dup_docs)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in hamming_pairs(fp, max_dist=32, block_bits=0).collect()
    }
    assert pairs[(0, 2)] == 0  # identical text → identical fingerprint
    assert pairs[(0, 1)] <= 6  # near-dup → few bits differ


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    V = rng.normal(size=(40, 16))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>",
    )
    got = cosine_topk(df, df.filter(F.col("vec_id") < 3), k=5).collect()
    S = V @ V.T
    for q in range(3):
        sims = [(round(S[q, c], 6), c) for c in range(40) if c != q]
        want = [c for _, c in sorted(sims, key=lambda t: (-t[0], t[1]))[:5]]
        have = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == q]
        assert have == want


def test_lsh_buckets_deterministic_and_partition_corpus(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b1 = {r.vec_id: r.bucket for r in bucketize(e).collect()}
    b2 = {r.vec_id: r.bucket for r in bucketize(e).collect()}
    assert b1 == b2
    assert len(b1) == e.count()
    assert all(0 <= v < 256 for v in b1.values())


def test_connected_components_known_graph(spark):
    from matrix_multiplication_map_reduce_gcp_spark.dedup.clusters import (
        connected_components,
    )

    # components: {1,2,3,4} (chain), {5,6}, {7} isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_banded_hamming_equals_exact(spark):
    """Pigeonhole banding must return EXACTLY the all-pairs result."""
    import numpy as np
    from matrix_multiplication_map_reduce_gcp_spark.dedup.simhash import (
        hamming_pairs,
        hamming_pairs_banded,
    )

    rng = np.random.default_rng(5)
    base = int(rng.integers(0, 2**32))
    fps = [(0, base)]
    for i in range(1, 40):
        fp = base
        for b in rng.choice(32, size=int(rng.integers(0, 8)), replace=False):
            fp ^= 1 << int(b)
        fps.append((i, fp))
    df = spark.createDataFrame(fps, "doc_id long, simhash long")
    exact = {tuple(r) for r in hamming_pairs(df, max_dist=3).collect()}
    banded = {tuple(r) for r in hamming_pairs_banded(df, max_dist=3).collect()}
    assert banded == exact and len(exact) > 0


def test_adaptive_planes_python_sql_parity():
    """lsh.adaptive_planes and its DuckDB CASE-ladder mirror must agree
    for every corpus size (the knn_graph oracle depends on it), and the
    chosen p must be the minimal plane count covering ceil(n/target)
    buckets within the clamp."""
    import duckdb

    from matrix_multiplication_map_reduce_gcp_spark.similarity.lsh import (
        KNN_TARGET_BUCKET,
        N_PLANES,
        N_PLANES_MAX,
        adaptive_planes,
        sql_adaptive_planes,
    )

    con = duckdb.connect()
    sizes = list(range(1, 70)) + [255, 256, 257, 8191, 8192, 8193,
                                  40_000, 2_000_000, 10**9]
    for n in sizes:
        py = adaptive_planes(n)
        con.sql("DROP VIEW IF EXISTS embeddings")
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM range({min(n, 1)})")
        # evaluate the ladder with COUNT(*) replaced by a literal so we
        # don't materialize 1e9 rows: the mirror only reads the count
        sql = sql_adaptive_planes().replace(
            "(SELECT COUNT(*) FROM embeddings)", str(n)
        )
        duck = con.sql(f"SELECT {sql} AS p").fetchone()[0]
        assert py == duck, (n, py, duck)
        need = (n + KNN_TARGET_BUCKET - 1) // KNN_TARGET_BUCKET
        assert N_PLANES <= py <= N_PLANES_MAX
        if py > N_PLANES:  # above the low clamp: never more than needed
            assert 2 ** (py - 1) < need
        if py < N_PLANES_MAX:  # below the high clamp: always enough
            assert 2 ** py >= need or py == N_PLANES


def test_simhash_token_cap_guard(spark):
    """Packed-lane simhash must REFUSE documents past the token cap
    (assert_true filter) rather than fingerprint them wrong — and
    accept one exactly at the cap. The production cap is 2^31-1 (no
    real document reaches it); the guard mechanism is exercised with
    a small injected cap."""
    import pytest

    from matrix_multiplication_map_reduce_gcp_spark.dedup.simhash import simhash

    over = spark.createDataFrame(
        [(1, "w " * 101)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="exceeds|ARITHMETIC_OVERFLOW"):
        simhash(over, token_cap=100).collect()
    at_cap = spark.createDataFrame(
        [(1, " ".join("w" for _ in range(100)))],
        "doc_id long, text string",
    )
    assert simhash(at_cap, token_cap=100).count() == 1


def test_simhash_handles_long_documents(spark):
    """Regression for the r6 4x16 lane geometry, whose 32767-token cap
    a single long web document could hit: a 40000-token doc (past the
    old cap, far under the 2-lane 2^31-1 cap) must fingerprint
    CORRECTLY. With one repeated token every bit's ones-count is n or
    0, so the fingerprint must equal hash60(token) exactly."""
    from pyspark.sql import functions as F

    from matrix_multiplication_map_reduce_gcp_spark.dedup.simhash import hash60, simhash

    doc = spark.createDataFrame(
        [(7, "w " * 40000)], "doc_id long, text string"
    )
    # "w " * n splits to n 'w' tokens + 1 trailing '' token; the ''
    # token contributes its own hash bits to the minority, which at
    # 40001 tokens can never outvote — fingerprint is hash60('w').
    got = simhash(doc).collect()[0]
    expected = spark.range(1).select(
        hash60(F.lit("w")).alias("h")
    ).collect()[0].h
    assert got.simhash == expected


def test_simhash_rejects_unpackable_n_bits(spark):
    """n_bits not divisible by the lane count would silently alias
    bits under shift-mod-64 — must refuse upfront."""
    import pytest

    from matrix_multiplication_map_reduce_gcp_spark.dedup.simhash import simhash

    doc = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(AssertionError, match="n_bits"):
        simhash(doc, n_bits=61)


def test_simhash_matches_independent_reference_model(spark):
    """Pin the r7 single-mask lane accumulation against a THIRD
    implementation: a pure-Python/hashlib per-bit majority model that
    shares no code with either engine. Random docs include repeated
    tokens (duplicate hash contributions must count multiply), single-
    token docs (all-ties: 2*ones > n false at ones=n... only for n
    even; a lone token sets exactly its own bits), and empty tokens
    from double spaces (split(' ') keeps them — so must the model)."""
    import hashlib
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "", "x", "longtokenvalue"]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(1, 40))))
            for i in range(1, 31)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def ref_fp(text: str) -> int:
        toks = text.split(" ")
        n = len(toks)
        fp = 0
        for b in range(60):
            ones = 0
            for t in toks:
                hv = int(hashlib.md5(f"s0|{t}".encode()).hexdigest()[:15], 16)
                ones += (hv >> b) & 1
            if 2 * ones > n:
                fp |= 1 << b
        return fp

    got = {r.doc_id: r.simhash for r in simhash(df).collect()}
    want = {i: ref_fp(t) for i, t in docs}
    assert got == want
