"""Property-based checks (hypothesis): algebraic laws of the matrix
operators hold for arbitrary shapes/densities — the generalization of
the fixed-seed NumPy tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from matrix_multiplication_map_reduce_gcp_spark.matrix import CooMatrix

SLOW = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def to_coo(spark, m):
    rows = [
        (int(i), int(j), float(m[i, j]))
        for i in range(m.shape[0])
        for j in range(m.shape[1])
        if m[i, j] != 0.0
    ]
    df = spark.createDataFrame(rows or [(0, 0, 0.0)], "i long, j long, v double")
    if not rows:
        df = df.filter("v != 0.0")
    return CooMatrix(df, m.shape[0], m.shape[1])


@st.composite
def int_matrix(draw, max_dim=8):
    r = draw(st.integers(1, max_dim))
    c = draw(st.integers(1, max_dim))
    density = draw(st.sampled_from([0.2, 0.6, 1.0]))
    seed = draw(st.integers(0, 2**16))
    rng = np.random.default_rng(seed)
    m = rng.integers(-9, 10, (r, c)).astype(float)
    mask = rng.random((r, c)) < density
    return m * mask


@given(data=st.data())
@settings(**SLOW)
def test_matmul_matches_numpy_any_shape(spark, data):
    a = data.draw(int_matrix())
    b_cols = data.draw(st.integers(1, 8))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    b = rng.integers(-9, 10, (a.shape[1], b_cols)).astype(float)
    got = to_coo(spark, a).multiply(to_coo(spark, b)).to_numpy()
    np.testing.assert_allclose(got, a @ b, rtol=0)


@given(data=st.data())
@settings(**SLOW)
def test_transpose_involution_and_add_commutes(spark, data):
    a = data.draw(int_matrix())
    A = to_coo(spark, a)
    np.testing.assert_allclose(A.transpose().transpose().to_numpy(), a, rtol=0)
    b = data.draw(int_matrix(max_dim=8))
    if b.shape != a.shape:
        b = np.resize(b, a.shape)
    B = to_coo(spark, b)
    np.testing.assert_allclose(
        A.add(B).to_numpy(), B.add(A).to_numpy(), rtol=0
    )


@given(data=st.data())
@settings(**SLOW)
def test_distributivity_a_times_b_plus_c(spark, data):
    a = data.draw(int_matrix(max_dim=6))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    b = rng.integers(-9, 10, (a.shape[1], 4)).astype(float)
    c = rng.integers(-9, 10, (a.shape[1], 4)).astype(float)
    A, B, C = to_coo(spark, a), to_coo(spark, b), to_coo(spark, c)
    left = A.multiply(B.add(C)).to_numpy()
    right_df = A.multiply(B).add(A.multiply(C))
    np.testing.assert_allclose(left, right_df.to_numpy(), rtol=0)


@st.composite
def edge_list(draw, max_nodes=30):
    n = draw(st.integers(2, max_nodes))
    n_edges = draw(st.integers(0, min(40, n * 2)))
    edges = [
        tuple(
            sorted(
                (
                    draw(st.integers(1, n)),
                    draw(st.integers(1, n)),
                )
            )
        )
        for _ in range(n_edges)
    ]
    return n, [(a, b) for a, b in edges if a != b]


@given(data=edge_list())
@settings(**SLOW)
def test_connected_components_match_union_find(spark, data):
    """Pointer-jumping min-label propagation must agree with a plain
    union-find on arbitrary graphs (chains, stars, cliques, forests,
    self-contained duplicates) — the generalization of the fixed
    known-graph tests."""
    from matrix_multiplication_map_reduce_gcp_spark.dedup.clusters import (
        connected_components,
    )

    n, edges = data

    parent = list(range(n + 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in range(1, n + 1)}

    pairs = spark.createDataFrame(
        edges or [(1, 1)], "doc_a long, doc_b long"
    )
    if not edges:
        pairs = pairs.filter("doc_a != doc_b")
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, n + 1)], "doc_id long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, nodes).collect()
    }
    assert got == want
