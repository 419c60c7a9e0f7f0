"""Iterative graph operator: connected components via min-label
propagation — turns near-dup PAIRS into near-dup CLUSTERS (the final
stage of the dedup stack: each cluster keeps one representative).

This is the engine's 'iterative algorithm' surface: a driver-side
loop over DataFrame ops, converging in O(cluster diameter) rounds.
Near-dup clusters are tiny (pairs → chains of 2-4 docs), so 3-5
rounds suffice; ``max_iter`` bounds the worst case.

Scale notes: each round is one join + one aggregate, shuffling on
doc_id — the standard large-graph CC under hash partitioning. The
convergence check (``changed == 0``) costs one count per round; at
100 TB rounds are few because label propagation halves the maximum
label distance each round (doubling trick not needed at dup-cluster
diameters).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id is
    the minimum node id reachable through the undirected pair graph.

    One job per round: the propagated labels carry a ``_chg`` flag and
    are localCheckpoint'ed (the single DAG execution); the convergence
    probe then reads the cached partitions — previously a separate
    ``.count()`` re-executed the whole round's join+agg (2× jobs).
    Raises on non-convergence rather than silently returning
    non-minimal labels."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    bi = fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # materialize the edge list ONCE: every propagation round would
    # otherwise re-execute the full upstream DAG — for near-dup
    # clustering that is the whole MinHash→LSH→Jaccard pipeline
    bi = bi.localCheckpoint(eager=True)
    nodes = bi.select("u").distinct()
    labels = nodes.withColumn("label", F.col("u"))

    converged = False
    for _ in range(max_iter):
        # each node adopts min(own label, neighbors' labels)
        neighbor_labels = (
            bi.join(labels.withColumnRenamed("u", "v2"), bi.v == F.col("v2"))
            .select("u", "label")
        )
        new_labels = (
            labels.select("u", "label")
            .union(neighbor_labels)
            .groupBy("u")
            .agg(F.min("label").alias("new_label"))
        )
        # bounded lineage + the ONLY execution of this round's DAG
        labels = (
            labels.join(new_labels, "u")
            .select(
                "u",
                F.col("new_label").alias("label"),
                (F.col("label") != F.col("new_label")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        # cheap scan of the already-materialized partitions
        changed = labels.filter(F.col("_chg")).limit(1).count()
        labels = labels.drop("_chg")
        if changed == 0:
            converged = True
            break

    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter; raise max_iter or use "
            "a doubling variant)"
        )
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_id"))
