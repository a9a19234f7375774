"""Iterative graph operators: connected components for dedup clustering.

Near-dup detection (MinHash-LSH / SimHash / n-gram Jaccard in
``operators/dedup``) emits PAIRS; deduplication needs CLUSTERS — pick one
canonical document per connected component of the similarity graph. That
closure is inherently iterative (SURVEY §2's "iterative algorithms" class:
no single SQL query expresses unbounded-diameter reachability without
recursion), so this is a driver-side loop of DataFrame joins.

Scale design:

- **Min-label propagation**, O(diameter) rounds. Near-dup graphs have tiny
  diameters (dup clusters are dense), so 5-10 rounds cover 100 TB corpora;
  for adversarial long-chain graphs switch to alternating large-star /
  small-star (Kiveris et al., "Connected Components in MapReduce"), which
  converges in O(log n) rounds with the same join primitive.
- **Lineage cut per round** via ``localCheckpoint`` — without it the plan
  doubles every iteration and planning time, not data, becomes the
  bottleneck.
- **Scalar convergence probe**: labels only ever decrease, so the sum of
  labels is strictly decreasing until fixpoint — one cheap aggregate per
  round instead of a change-count join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    id = the smallest node id reachable from the node. Raises if the label
    propagation hasn't converged within ``max_iter`` rounds (near-dup
    cluster diameters are small; hitting the cap means the input isn't the
    kind of graph this propagation variant is for)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "use star-contraction for long-chain graphs"
    )
