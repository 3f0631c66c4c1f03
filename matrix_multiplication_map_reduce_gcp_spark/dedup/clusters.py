"""Dedup clustering: connected components over the near-dup pair graph.

LSH emits pairwise candidates; the keep/drop decision needs CLUSTERS
(a~b, b~c ⇒ {a,b,c} keep one). Components via iterative min-label
propagation — each round every node takes the minimum label in its
neighborhood; converges in O(component diameter) rounds to a unique
fixpoint, so the result is deterministic and oracle-checkable (the
DuckDB oracle computes the same fixpoint with a recursive CTE).

Scale shape per round: one join (labels ⋈ edges) + one groupBy(min),
plus a labels self-join that implements POINTER JUMPING (each node
also adopts its current label's label). Plain neighbor-min needs
O(component diameter) rounds — a 10^6-node chain at 100 TB would blow
any iteration cap — while the jumping variant halves remaining
distance-to-root every round, converging in O(log diameter) rounds
(the same doubling idea as Kiveris et al.'s alternating star
algorithm, "Connected Components in MapReduce and Beyond", SoCC'14).
The fixpoint is unchanged (min doc_id per component), so the DuckDB
recursive-CTE oracle still matches exactly. The driver loop stops
when a round changes nothing — the classic Spark iterative-algorithm
pattern (like the reference's orchestrator barrier loop,
orchestrator/main.py:84-116, but data-driven)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, nodes: DataFrame, max_iter: int = 20
) -> DataFrame:
    """pairs: (doc_a, doc_b); nodes: (doc_id). Returns
    (doc_id, cluster_id) with cluster_id = min doc_id in the component."""
    # Materialize the edge set ONCE. Without this every round's
    # neighbor-min join re-executes the full upstream pair pipeline
    # (shingling + MinHash + banding — more expensive than the whole
    # CC loop on its output), multiplying its cost by the round count.
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Iterate ONLY the active subgraph (nodes with at least one edge).
    # Singletons can never change label, yet they dominate the corpus
    # (a near-dup graph at 100 TB touches a small fraction of docs) —
    # looping over all of `nodes` per round makes every round O(corpus)
    # instead of O(pairs). Edges are symmetric, so src alone covers
    # every endpoint. Singletons rejoin as identity labels at the end.
    active = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = active.select(F.col("doc_id"), F.col("doc_id").alias("cluster_id"))
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        # Pointer jumping: my label's label. cluster_id is always some
        # node's doc_id, so the self-join is a plain equi-join on the
        # same key the labels table is already hashed by.
        jumped = (
            labels.alias("l")
            .join(
                labels.select(
                    F.col("doc_id").alias("p_doc"),
                    F.col("cluster_id").alias("jmin"),
                ),
                F.col("l.cluster_id") == F.col("p_doc"),
                "left",
            )
            .select(F.col("l.doc_id").alias("doc_id"), "cluster_id", "jmin")
        )
        updated = (
            jumped.join(neighbor_min, jumped.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("nmin", F.col("cluster_id")),
                    F.coalesce("jmin", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # Checkpoint FIRST (truncate lineage), then test convergence
        # against the checkpointed result — computing `changed` off the
        # raw `updated` lineage would execute the round's joins twice.
        new_labels = updated.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Silent unconvergence would return WRONG cluster labels (a
        # component with diameter > max_iter splits into several ids).
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations; raise max_iter (components deeper than this "
            "exist in the pair graph)"
        )
    # Singletons (no edges) are their own cluster: identity label via
    # a left join — broadcast-shaped at real scale because the active
    # label table is O(pairs), tiny next to the corpus.
    return nodes.select("doc_id").join(
        labels.select(F.col("doc_id").alias("a_doc"), "cluster_id"),
        F.col("doc_id") == F.col("a_doc"),
        "left",
    ).select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )


def sql_components_ctes(pairs_sql: str) -> str:
    """The recursive-CTE connected-components block, parameterized by
    the pairs source — the SINGLE definition both the dedup_clusters
    and dedup_keep_list oracles build on (semantics fixed in one
    place). Produces CTEs: pairs, nodes, edges, reach, comp(doc_id,
    cluster_id). Callers prepend WITH RECURSIVE and SELECT from comp."""
    return f"""
    pairs AS ({pairs_sql}),
    nodes AS (SELECT doc_id FROM documents),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT n.doc_id,
             LEAST(n.doc_id, COALESCE(MIN(r.dst), n.doc_id)) AS cluster_id
      FROM nodes n LEFT JOIN reach r ON r.src = n.doc_id
      GROUP BY n.doc_id)
    """
