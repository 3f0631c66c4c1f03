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
    # Pointer jumping covers distance ~2^r in r rounds; 1 round cannot
    # collapse a 25-node chain, and unconvergence must raise, not
    # silently return split components.
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, nodes, max_iter=1)
    ok = connected_components(chain, nodes, max_iter=30)
    assert {r.cluster_id for r in ok.collect()} == {1}


def test_components_path_graph_converges_at_default_iters(spark):
    """A 50-node path has diameter 49: plain neighbor-min propagation
    needs ~49 rounds and would blow the default max_iter=20. Pointer
    jumping must converge it within the default budget (O(log d))."""
    from matrix_multiplication_map_reduce_gcp_spark.dedup.clusters import (
        connected_components,
    )

    n = 50
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    got = connected_components(path, nodes).collect()
    assert len(got) == n
    assert {r.cluster_id for r in got} == {1}


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


def test_scd2_same_timestamp_runs_are_deterministic(spark, tmp_path):
    """Two events at the SAME microsecond with different types split
    into two runs sharing valid_from; the (valid_from, seg_id)
    tiebreak must chain them deterministically in BOTH engines
    (review round 2: LEAD ordered by valid_from alone was ambiguous)."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0, 7, "click", 1.0, "{}"),   # same ts, new run
        (3, t0 + datetime.timedelta(hours=1), 7, "view", 1.0, "{}"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            # the real fixture stores TIMESTAMP(NANOS); the catalog
            # loader normalizes ns->us and breaks on anything else
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/events.parquet")

    qs = registry.load_all()
    qd = qs["scd2_user_event_history"]
    got = sorted(
        (r.event_type, r.valid_from, r.valid_to, r.is_current, r.n_events)
        for r in qd.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    want = sorted(
        (r[1], r[2], r[3], r[4], r[5]) for r in con.sql(qd.oracle).fetchall()
    )
    assert got == want
    # run 1 (view@t0) must close at t0 (zero-length validity), run 2
    # (click@t0) closes at t0+1h, run 3 is current.
    assert [g[3] for g in got].count(True) == 1


def test_image_oracles_handle_empty_text(spark, tmp_path):
    """documents with text='' must agree between the Spark decoder
    (1x1 all-zero PNG -> pixel_sum 0, ahash from zero pixels) and the
    oracle (review round 2: r.i % 0 made every oracle pixel NULL)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["", "", "hello world"]),
            "lang": pa.array(["en", "en", "en"]),
            "source": pa.array(["s", "s", "s"]),
            "n_chars": pa.array([0, 0, 11], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")

    qs = registry.load_all()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    meta = qs["multimodal_image_meta"]
    got = sorted(tuple(r) for r in meta.fn(spark, str(tmp_path)).collect())
    want = sorted(con.sql(meta.oracle).fetchall())
    assert got == want
    assert got[0][5] == 0  # pixel_sum of the empty doc is 0, not NULL

    dup = qs["multimodal_image_dup_groups"]
    got_d = sorted(tuple(r) for r in dup.fn(spark, str(tmp_path)).collect())
    want_d = sorted(con.sql(dup.oracle).fetchall())
    assert got_d == want_d
    assert len(got_d) == 1  # the two empty docs form one dup group


def test_sn_neighbors_null_sort_key_matches_oracle(spark):
    """Cross-engine NULL-ordering parity for the shared sorted-
    neighborhood helper (r6 ADVICE): Spark's default ascending sort
    puts NULLs FIRST, DuckDB's ROW_NUMBER puts them LAST — a NULL sort
    key (NULL text head / NULL bucket) would shift every neighbor in
    the partition and diverge the candidate sets. _sn_neighbors now
    pins asc_nulls_last and the oracles say NULLS LAST; this feeds a
    NULL head through both engines and requires identical pair sets."""
    import duckdb
    from pyspark.sql import functions as F

    from matrix_multiplication_map_reduce_gcp_spark.dedup.queries import _sn_neighbors

    rows = [
        (1, "en", "aaa"),
        (2, "en", None),  # NULL sort key
        (3, "en", "bbb"),
        (4, "en", "aab"),
        (5, "en", None),  # second NULL: NULL-vs-NULL tie falls to doc_id
        (6, "fr", "zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, head string")
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in _sn_neighbors(
            df,
            part_cols=("lang",),
            order_cols=("head", "doc_id"),
            width=2,
            lead_cols=("doc_id",),
            keep_cols=("doc_id",),
        )
        .select(
            F.least("doc_id", "p.doc_id").alias("doc_a"),
            F.greatest("doc_id", "p.doc_id").alias("doc_b"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.sql("CREATE TABLE d (doc_id BIGINT, lang VARCHAR, head VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            WITH nb AS (
              SELECT doc_id, lang,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY head NULLS LAST,
                                                 doc_id NULLS LAST) AS rn
              FROM d)
            SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
                   GREATEST(a.doc_id, b.doc_id) AS doc_b
            FROM nb a JOIN nb b
              ON a.lang = b.lang AND b.rn BETWEEN a.rn + 1 AND a.rn + 2
            """
        ).fetchall()
    )
    assert got == want
    # The NULL-head rows must sort AFTER every non-null head: with
    # width=2 the en-partition order is aaa,aab,bbb,NULL(2),NULL(5),
    # so (2,5) is a pair and (1,2) is not.
    assert (2, 5) in got and (1, 2) not in got


def test_capped_dedup_null_text_oracle_parity(spark, tmp_path):
    """End-to-end pin for the NULLS LAST contract on REAL query paths:
    a documents table containing NULL text (NULL sort-key head) must
    keep levenshtein_near_dup_pairs_capped and sorted_neighborhood_pairs
    bit-identical to their DuckDB oracles. Pre-fix, Spark's
    NULLS-FIRST default shifted every row_number in the block, so the
    NON-null rows' neighbor sets diverged across engines even though
    the NULL rows' own pairs are filtered by the NULL edit distance."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "the quick brown fox leaps over the lazy dog",
        None,
        "a completely different document about spark",
        "a completely different document about sparks",
        None,
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            # Same len bucket for everyone so NULL and non-NULL rows
            # share one block and the sort-order contract is what
            # separates the engines.
            "n_chars": pa.array([44] * len(texts), pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    qs = registry.load_all()
    for name in ("levenshtein_near_dup_pairs_capped", "sorted_neighborhood_pairs"):
        q = qs[name]
        got = sorted(tuple(r) for r in q.fn(spark, str(tmp_path)).collect())
        want = sorted(tuple(r) for r in con.sql(q.oracle).fetchall())
        assert got == want, (name, got, want)
        assert got, f"{name}: fixture produced no pairs — test is vacuous"
