"""PQ/IVF-PQ recall behaves monotonically under its deployment knobs.

SHORTLIST (ADC candidates per query that get an exact rerank) and
NPROBE (IVF cells probed) are the knobs a 100 TB deployment actually
turns to trade cost for recall. These tests prove the trade behaves:
recall@k vs the exact ground truth is monotone non-decreasing in each
knob and reaches 1.0 when the knob covers the whole corpus — so
turning the knob up can never make results worse, and the exact
baseline is the fixpoint.

Ground truth: exact quantized-L2 top-k — computed as adc_rerank_topk
with shortlist = corpus size, which by construction reranks every
corpus vector with exact distances (ADC prunes nothing).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
from matrix_multiplication_map_reduce_gcp_spark.similarity import pq

SF = "/root/testdata/sf0.001"
N_QUERIES = 8
K = 10


@pytest.fixture(scope="module")
def embeddings(spark):
    e = load_table(spark, SF, "embeddings")
    e.cache().count()
    yield e
    e.unpersist()


@pytest.fixture(scope="module")
def corpus_size(embeddings):
    return embeddings.count()


@pytest.fixture(scope="module")
def exact_topk(embeddings, corpus_size):
    """{query_id: frozenset(neighbor ids)} — exact quantized-L2 top-k."""
    df = pq.adc_rerank_topk(embeddings, N_QUERIES, K, shortlist=corpus_size)
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(out) == N_QUERIES
    return {q: frozenset(s) for q, s in out.items()}


def _recall(df, exact) -> float:
    got: dict[int, set[int]] = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & exact[q]) for q in exact)
    return hits / (len(exact) * K)


def test_rerank_recall_monotone_in_shortlist(embeddings, corpus_size, exact_topk):
    sweep = [10, 50, 200, corpus_size]
    recalls = [
        _recall(
            pq.adc_rerank_topk(embeddings, N_QUERIES, K, shortlist=s), exact_topk
        )
        for s in sweep
    ]
    assert recalls == sorted(recalls), (
        f"recall not monotone in shortlist: {dict(zip(sweep, recalls))}"
    )
    assert recalls[-1] == 1.0, "full-corpus shortlist must be exact"
    # The default knob setting must already be useful, not degenerate.
    assert recalls[1] >= 0.5, (
        f"recall@{K} at the default shortlist={sweep[1]} collapsed "
        f"to {recalls[1]:.2f}"
    )


def test_ivfpq_recall_monotone_in_nprobe(embeddings, corpus_size, exact_topk):
    """Monotone in nprobe ONLY with the shortlist covering the
    candidate set. (With the tight default shortlist the guarantee
    genuinely fails: measured nprobe→recall of {1: 0.8375, 3: 0.8625,
    16: 0.85} — extra ADC-preferred candidates crowd true neighbors
    out of a fixed-size shortlist. That interaction is documented on
    ivfpq_topk; deployments must turn the two knobs together.)"""
    from matrix_multiplication_map_reduce_gcp_spark.similarity.ivf import N_CENTROIDS

    sweep = [1, pq.NPROBE, N_CENTROIDS]
    recalls = [
        _recall(
            pq.ivfpq_topk(
                embeddings, N_QUERIES, K, nprobe=p, shortlist=corpus_size
            ),
            exact_topk,
        )
        for p in sweep
    ]
    assert recalls == sorted(recalls), (
        f"recall not monotone in nprobe: {dict(zip(sweep, recalls))}"
    )
    assert recalls[-1] == 1.0, (
        "probing every cell with a full shortlist must be exact"
    )


def test_ivfpq_full_probe_equals_rerank(embeddings, spark):
    """nprobe = all cells ⇒ the IVF stage prunes nothing, so IVF-PQ
    must return exactly adc_rerank_topk's answer (same shortlist)."""
    from matrix_multiplication_map_reduce_gcp_spark.similarity.ivf import N_CENTROIDS

    full = pq.ivfpq_topk(embeddings, N_QUERIES, K, nprobe=N_CENTROIDS)
    rerank = pq.adc_rerank_topk(embeddings, N_QUERIES, K)
    diff = full.exceptAll(rerank).union(rerank.exceptAll(full))
    assert diff.count() == 0
