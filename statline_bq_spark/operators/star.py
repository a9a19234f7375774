"""Star-schema join operators (SURVEY.md §2.B Q1-Q3).

The reference publishes a wide fact table plus tiny dimension code tables
(6-124 rows in its fixtures; reference ``main.py:492-526``) so every decode
is a fact × small-dim equi-join. The scale-correct physical plan is a
broadcast hash join on every dimension — zero shuffle of the fact side —
which we force with ``F.broadcast`` rather than trusting the
autoBroadcastJoinThreshold at 100 TB (dim tables stay small even when facts
grow 1000×).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column]],
    *,
    broadcast_dims: bool = True,
) -> DataFrame:
    """Chain fact ⋈ dim equi-joins, broadcasting each dimension side.

    ``dims`` is a sequence of ``(dim_df, join_condition)``. Dimension order
    doesn't matter for correctness; broadcasting makes each join a map-side
    hash join so the fact table is scanned exactly once with no shuffle
    (the Spark rendition of reference Q1/Q2, SURVEY.md §2.B).
    """
    out = fact
    for dim, cond in dims:
        side = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(side, cond, "inner")
    return out


def decode_codes(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    label_cols: dict[str, str],
    *,
    how: str = "inner",
) -> DataFrame:
    """Code → label decode (reference Q3): join a code table and project its
    Title-like columns under new names. ``label_cols`` maps dim column →
    output alias.

    With the default ``how='inner'``, fact rows whose code is NULL or
    absent from the dimension are dropped (classic star-join semantics);
    pass ``how='left'`` to keep them with NULL labels, or use the
    eqNullSafe pattern from the ``null_safe_dim_join`` query when NULL is
    itself a legitimate dimension member."""
    joined = fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], how)
    projections = [fact["*"]] + [dim[c].alias(a) for c, a in label_cols.items()]
    return joined.select(*projections)
