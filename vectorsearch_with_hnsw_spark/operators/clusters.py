"""Duplicate-cluster assignment: connected components over near-dup pairs.

The dedup family (operators/dedup.py) emits PAIRS; a real training-data
pipeline needs the transitive closure — "these 7 documents are all the
same article" — so one keeper per component can be chosen. This is the
step after MinHash/SimHash in every large-scale dedup stack.

Algorithm: iterative min-label propagation (each node repeatedly takes
the min label among itself and its neighbors) — the standard
Spark-friendly connected-components loop. Per iteration: one join
(labels onto edge endpoints) + one groupBy min, both shuffling on the
same node key, so at scale each iteration is two co-partitioned
exchanges over the EDGE relation only; converges in O(graph diameter)
iterations (near-dup clusters are shallow — diameter is small because
duplicate groups are quasi-cliques). Lineage is truncated with
localCheckpoint every iteration: without it the plan doubles per
iteration and the driver, not the data, becomes the bottleneck.

The reference has no graph operators at all — this extends its dedup
story (north star §"Deduplication") rather than mirroring a reference
file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id = min
    node id in the component. Deterministic for any input order.

    The convergence check is a driver-side count of changed labels —
    one scalar per iteration, not a collect of the data.
    """
    edges = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # undirected: propagate both ways
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)  # pair-generation plan runs ONCE

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "node")
        )
        # carry a change flag inline: convergence costs one cheap count
        # over the checkpointed frame, not an extra join against the old
        # labels
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                new_label.alias("new_label"),
                (new_label < F.col("label")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if stepped.filter(F.col("chg")).limit(1).count() == 0:
            break

    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Cluster assignment for near-dup pairs: (doc_id, cluster_id,
    is_keeper). Keeper = the min doc_id of each component (deterministic
    canonical representative)."""
    cc = connected_components(pairs, max_iter=max_iter)
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
    )
