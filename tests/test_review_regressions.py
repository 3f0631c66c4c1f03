"""Regression pins for the round-1 code-review fixes — each of these
was a real latent bug; the scenarios here are the ones that exposed
them."""

from __future__ import annotations

import pytest

from matrix_multiplication_map_reduce_gcp_spark import registry


def test_registry_imports_are_strict(monkeypatch):
    """A broken query module must fail load_all() loudly, not shrink
    the registry silently."""
    monkeypatch.setattr(
        registry,
        "_QUERY_MODULES",
        registry._QUERY_MODULES + ("matrix_multiplication_map_reduce_gcp_spark.operators.nope",),
    )
    with pytest.raises(ModuleNotFoundError):
        registry.load_all()


def test_components_unconvergence_raises(spark):
    from matrix_multiplication_map_reduce_gcp_spark.dedup.clusters import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 25)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 26)], "doc_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, nodes, max_iter=5)
    ok = connected_components(chain, nodes, max_iter=30)
    assert {r.cluster_id for r in ok.collect()} == {1}


def test_block_multiply_sums_duplicate_cells(spark):
    from matrix_multiplication_map_reduce_gcp_spark.matrix.block import block_multiply
    from matrix_multiplication_map_reduce_gcp_spark.matrix.coo import CooMatrix

    dup = spark.createDataFrame(
        [(0, 0, 1.0), (0, 0, 2.0), (1, 1, 1.0)], "i long, j long, v double"
    )
    ident = spark.createDataFrame(
        [(0, 0, 1.0), (1, 1, 1.0)], "i long, j long, v double"
    )
    A, I = CooMatrix(dup, 2, 2), CooMatrix(ident, 2, 2)
    ja = {(r.i, r.j): r.v for r in A.multiply(I).df.collect()}
    bl = {(r.i, r.j): r.v for r in block_multiply(A, I, block_size=2).df.collect()}
    assert ja == bl == {(0, 0): 3.0, (1, 1): 1.0}


def test_hamming_default_is_exact(spark):
    from matrix_multiplication_map_reduce_gcp_spark.dedup.simhash import hamming_pairs

    fp = spark.createDataFrame(
        [(1, 0x00FFFFFF), (2, 0x80FFFFFF)], "doc_id long, simhash long"
    )
    got = hamming_pairs(fp, max_dist=3).collect()
    assert len(got) == 1 and got[0].hamming == 1
