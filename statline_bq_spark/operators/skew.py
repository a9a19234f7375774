"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on in ``session.get_spark``) handles most skew by
splitting oversized post-shuffle partitions, but it only works for
sort-merge joins and only after a shuffle materializes. Explicit salting is
the planned alternative when a handful of hot keys are known to dominate
(the "null key" / "default value" pathology of real fact tables): it spreads
each hot key over ``salt_parts`` synthetic sub-keys *before* the shuffle, so
no single task ever receives a whole hot key.

Semantics: ``salted_join(a, b, on)`` ≡ ``a.join(b, on)`` — verified by the
oracle-checked query that uses it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    *,
    salt_parts: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the skewed side's rows are deterministically spread
    over ``salt_parts`` sub-keys and the other side is replicated
    ``salt_parts``× (explode of a literal range — no extra scan).

    ``salt_source`` must be an expression over the *skewed* side that varies
    within a join key (a line number, a unique id, a hash of payload
    columns); deterministic salting keeps reruns/retries stable, which
    matters for exactly-once sinks. Replication multiplies the other side's
    shuffle volume by ``salt_parts`` — use only when the other side is the
    smaller one and the skew is real.

    How ``how`` composes with the salt:

    - ``inner``/``left``/``left_semi``/``left_anti``: the salted join is
      directly equivalent — each skewed row carries exactly ONE salt and
      the other side is replicated across ALL salts, so every key match
      survives and unmatched skewed rows appear exactly once.
    - ``right``/``full``: the direct form would be WRONG — an unmatched
      ``other`` row was exploded into ``salt_parts`` replicas, none of
      which match, so a naive outer join would emit it ``salt_parts``
      times null-extended. These modes therefore run as the salted INNER
      join unioned with the unmatched rows recovered by per-side key
      anti-joins (the anti-join probes a distinct-key aggregate, so the
      hot key collapses to one row — no skew re-introduced).
    """
    on = list(on)
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in skewed.columns])
    a = skewed.withColumn(SALT_COL, F.pmod(salt_source, F.lit(salt_parts)))
    b = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt_parts)])),
    )
    how_n = how.lower().replace("_", "")
    if how_n in ("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"):
        return a.join(b, [*on, SALT_COL], how).drop(SALT_COL)
    if how_n in ("right", "rightouter", "full", "fullouter", "outer"):
        matched = a.join(b, [*on, SALT_COL], "inner").drop(SALT_COL)
        # unmatched other rows: key absent from the skewed side (or NULL —
        # equality join keys never match NULL, same as the plain join)
        lonely_other = other.join(
            skewed.select(*on).distinct(), on, "left_anti"
        )
        out = matched.unionByName(lonely_other, allowMissingColumns=True)
        if how_n in ("full", "fullouter", "outer"):
            lonely_skewed = skewed.join(
                other.select(*on).distinct(), on, "left_anti"
            )
            out = out.unionByName(lonely_skewed, allowMissingColumns=True)
        # restore the plain-join column order (on, skewed-rest, other-rest)
        return out.select(*matched.columns)
    raise ValueError(f"unsupported join type for salted_join: {how!r}")
