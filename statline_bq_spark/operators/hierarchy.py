"""Hierarchy flattening / transitive closure (SURVEY.md §2.B Q4).

The reference publishes parent-pointer hierarchies: `CategoryGroups.ParentID`
(reference ``main.py:501``) and v4 `MeasureGroups.ParentId` /
`{Dimension}Groups` (``main.py:519-524``). Downstream rollups need the
child → every-ancestor closure.

Spark ≤3.x has no recursive CTE, so the closure is an iterative self-join
with a depth cap. Scale notes: real code hierarchies are shallow (CBS
fixtures ≤ a few levels) and the *edge* table is dimension-sized, so every
iteration is a broadcast join against the small edge set — the fact table is
never touched. Depth is bounded by ``max_depth`` to guarantee termination on
cyclic dirty data; each level is checkpointed via localCheckpoint when the
plan gets deep to stop lineage blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hierarchy_closure(
    edges: DataFrame,
    *,
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = 12,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Transitive closure of a parent-pointer edge table.

    Input: ``edges(child, parent)`` — one row per direct link.
    Output: ``(child, ancestor, depth)`` — every ancestor at every distance,
    depth ≥ 1, capped at ``max_depth``. SET semantics: a transitive
    closure is a set of (child, ancestor, depth) facts, so duplicate
    edges (double-loaded dimension rows — round-10 row-duplication
    fixture) and diamond-shaped multi-paths collapse instead of
    multiplying. This is also the scale property: bag closure grows as
    #paths (exponential on dense graphs), set closure as #pairs — the
    per-level ``distinct`` is what makes iterative closure viable at all
    on large graphs (classic semi-naive evaluation).
    """
    base = edges.select(
        F.col(child_col).alias("child"),
        F.col(parent_col).alias("ancestor"),
        F.lit(1).alias("depth"),
    ).distinct()
    closure = base
    frontier = base
    for level in range(2, max_depth + 1):
        step = (
            frontier.alias("f")
            .join(
                F.broadcast(base.alias("e")),
                F.col("f.ancestor") == F.col("e.child"),
                "inner",
            )
            .select(
                F.col("f.child").alias("child"),
                F.col("e.ancestor").alias("ancestor"),
                F.lit(level).alias("depth"),
            )
            .distinct()
        )
        if step.isEmpty():
            break
        closure = closure.unionByName(step)
        frontier = step
        if level % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=True)
    return closure
