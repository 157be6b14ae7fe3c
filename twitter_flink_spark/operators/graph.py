"""Iterative graph operator: connected components over a pair list —
turning near-dup PAIRS (MinHash-LSH output) into dedup CLUSTERS, the final
step of a training-data dedup pipeline (keep one doc per component).

Spark has no recursive query support, so this is the canonical iterative-
DataFrame pattern: min-label propagation to a fixed point, with
`localCheckpoint` per round to truncate lineage (otherwise the plan doubles
every iteration and the driver dies at planning, long before data size
matters). Convergence needs a driver-side count per round — that is
inherent to iterate-until-fixed-point, the same loop GraphX/Pregel runs.

Scale: each round is one self-contained shuffle join (edges ⨝ labels on
node id) + a min-aggregate; rounds needed = graph diameter, and near-dup
graphs are overwhelmingly tiny cliques (diameter 1-2). For adversarial
long-chain graphs switch to large-star/small-star (alternating min-label
exchange), which converges in O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id = min
    node id reachable through the pair graph."""
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    bidir = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        bidir.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_labels = bidir.join(
            labels, bidir.dst == labels.node
        ).select(F.col("src").alias("node"), "label")
        new_labels = (
            labels.unionAll(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # eager: materializes + truncates lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    bidir.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
