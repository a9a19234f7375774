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
    """
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in skewed.columns])
    a = skewed.withColumn(SALT_COL, F.pmod(salt_source, F.lit(salt_parts)))
    b = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt_parts)])),
    )
    out = a.join(b, [*on, SALT_COL], how)
    return out.drop(SALT_COL)
