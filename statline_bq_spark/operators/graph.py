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
  for adversarial long-chain graphs :func:`connected_components_star`
  implements alternating large-star / small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond"), which converges in
  O(log n) rounds with the same join primitive.
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
    # Probe sums as decimal(38,0): node ids are routinely 64-bit hashes
    # (xxhash64-derived doc ids, magnitude ~2^62), and summing even a
    # handful of same-sign longs would throw ARITHMETIC_OVERFLOW under
    # ANSI (Spark 4 default). 38 digits of headroom cover ~10^19 rows of
    # worst-case ids; the strictly-decreasing invariant is exact either way.
    def _label_sum(lbl: DataFrame):
        return lbl.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
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
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "use connected_components_star for long-chain graphs"
    )


def _star_round(edges: DataFrame, *, large: bool) -> DataFrame:
    """One large-star or small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SOCC'14).

    ``edges`` is an (a, b) pair list treated as undirected. Per node u over
    its neighborhood Γ(u): m = min(Γ(u) ∪ {u}); large-star re-links the
    STRICTLY LARGER neighbors (v > u) to m, small-star re-links the
    smaller-or-equal neighbors and u itself to m. Alternating the two
    converges to depth-1 stars in O(log n) rounds regardless of diameter.

    Shuffle shape per round: one groupBy(u) min-aggregate (map-side
    partials) and one equi-join of the edge list back on u — both on
    8-byte node ids.
    """
    if large:
        # symmetrize: Γ(u) needs both directions
        adj = edges.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).union(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    else:
        # orient each edge so u >= v: Γ⁻(u) = smaller neighbors
        adj = edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
    mins = adj.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    linked = adj.join(mins, "u")
    if large:
        out = linked.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
    else:
        out = linked.select(
            F.col("v").alias("a"), F.col("m").alias("b")
        ).union(
            mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
        )
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star — the
    O(log n)-round variant for graphs whose diameter defeats
    :func:`connected_components`' min-label propagation (long chains of
    near-dup pairs, transitive similarity paths). Not hypothetical: the
    sf0.1 SIMHASH pair graph already chains past diameter 10 (hamming
    near-dups are barely transitive), while the Jaccard-threshold graphs
    stay dense and shallow — pick the variant by how transitive the
    similarity is.

    Same output contract as :func:`connected_components`: component id =
    the smallest node id in the component, one row per node appearing in
    ``edges``. Convergence probe: the (a, b) edge list is a forest of
    depth-1 stars exactly when a round leaves the edge SET unchanged —
    detected by (count, XOR-of-edge-hashes) scalars, one cheap aggregate
    per round instead of a change-count join.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_probe = None
    for _ in range(max_iter):
        e = _star_round(e, large=True)
        e = _star_round(e, large=False).localCheckpoint(eager=True)
        probe = e.agg(
            F.count(F.lit(1)).alias("n"),
            # order-insensitive set fingerprint: XOR of per-edge 64-bit
            # hashes (the edge list is distinct, so set semantics hold;
            # XOR can't overflow under ANSI the way a hash SUM does).
            # Coordinate sums alone could collide across distinct edge
            # sets and exit early.
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        probe = (probe["n"], probe["h"])
        if probe == prev_probe:
            break
        prev_probe = probe
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # stars: every surviving edge is (child, root). Roots and isolated-by-
    # self-loop nodes label themselves.
    labels = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )
