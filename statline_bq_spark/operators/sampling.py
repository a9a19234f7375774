"""Sampling & splitting operators (north-star training-pipeline surface).

Two different tools for two different jobs:

- :func:`hash_split` — content-hash assignment. Deterministic per ROW
  (not per run): stable under repartitioning, re-runs, cluster size, and
  incremental appends. This is the correct way to carve train/test/val
  from a 100 TB corpus — a row's split never changes when data around it
  does. md5 is used (not xxhash64) so external systems can reproduce the
  assignment.
- :func:`stratified_sample` — ``df.sampleBy``: per-stratum Bernoulli
  sampling, seeded. Right for downsampling over-represented strata (e.g.
  per-language caps); per-row membership depends on partition layout, so
  it is NOT re-run-stable — don't use it to define datasets, use it to
  shrink them.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, *, n_buckets: int = 256, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from md5(salt || key). Two hex chars
    cover 256 buckets; widen for finer splits."""
    if not 1 <= n_buckets <= 65536:
        raise ValueError("n_buckets must be in [1, 65536]")
    n_hex = 2 if n_buckets <= 256 else 4
    raw = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, n_hex),
        16,
        10,
    ).cast("int")
    return F.pmod(raw, F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    key: str | Column,
    splits: Mapping[str, float],
    *,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by content hash; ``splits`` maps
    name → fraction (must sum to ~1). Fractions quantize to 1/256.

    A NULL key gets a NULL split (same contract as :func:`kfold_assign`):
    ``md5(NULL)`` is NULL, every range test on it is NULL, and letting
    those rows fall through ``otherwise`` would silently route the entire
    NULL-key error population into the LAST-named split — deterministic
    leakage into one dataset. NULL marks them for the caller to triage.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    key_col = F.col(key) if isinstance(key, str) else key
    bucket = hash_bucket(key_col, n_buckets=256, salt=salt)
    expr = F.when(key_col.isNull(), F.lit(None).cast("string"))
    hi = 0
    names = list(splits)
    for name in names[:-1]:
        hi += int(round(splits[name] * 256))
        expr = expr.when(bucket < hi, name)
    expr = expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: Mapping[str, float],
    *,
    seed: int,
    default_fraction: float | None = None,
    strata: Sequence[str] | None = None,
) -> DataFrame:
    """Seeded per-stratum Bernoulli downsampling via ``sampleBy``.

    ``fractions`` maps stratum value → keep fraction; strata not listed are
    DROPPED unless ``default_fraction`` is given with an explicit
    ``strata`` universe (``sampleBy`` semantics — never let an unlisted
    stratum pass silently at full volume).
    """
    fr = dict(fractions)
    if default_fraction is not None:
        if strata is None:
            raise ValueError("default_fraction requires the strata universe")
        for s in strata:
            fr.setdefault(s, default_fraction)
    return df.sampleBy(stratum_col, fr, seed=seed)


def kfold_assign(
    df: DataFrame,
    key: str | Column,
    k: int,
    *,
    salt: str = "",
    out_col: str = "fold",
) -> DataFrame:
    """K-fold cross-validation fold assignment by content hash: fold =
    (first 4 md5 hex chars of the key) mod k.

    Same stability contract as :func:`hash_split` — a row's fold never
    changes under repartitioning, re-runs, or appends, so fold i's
    train/validate complement is reproducible years later from the data
    alone. 16 bits of hash keep the mod-k bias below 2^-12 for any k ≤ 16;
    md5 (not xxhash64) so any engine can re-derive the assignment — the
    oracle re-computes every fold id, not just the per-fold counts.
    """
    if not 2 <= k <= 16:
        raise ValueError("k must be in [2, 16]")
    key_col = F.col(key) if isinstance(key, str) else key
    bucket = hash_bucket(key_col, n_buckets=65536, salt=salt)
    return df.withColumn(out_col, F.pmod(bucket, F.lit(k)).cast("int"))


def token_budget_fill(
    df: DataFrame,
    group: str,
    tokens: Column,
    budget: int,
    *,
    order_by: Sequence[Column],
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Greedy per-group token-budget fill: order each group's rows by
    ``order_by`` (must be a total order — include a unique id as the final
    tie-break) and keep rows while the RUNNING token total stays within
    ``budget``. The standard "fill each source's quota with its best
    documents" step when composing a training mixture under a fixed token
    budget.

    One shuffle on ``group``; the running sum is a per-group window over
    rows already co-located by that shuffle. Skew note: a group's rows sort
    within a single task — at 100 TB cap per-group candidate counts
    upstream (e.g. ``reservoir_per_key``) before the fill, or pre-filter
    with an approximate per-group quantile of the priority so only
    ~budget-sized candidate sets reach the window.
    """
    w = (
        Window.partitionBy(group)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(cum_col, F.sum(tokens).over(w)).filter(
        F.col(cum_col) <= budget
    )


def reservoir_per_key(
    df: DataFrame,
    key: str,
    id_col: str,
    k: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic uniform sample WITHOUT replacement of ``k`` rows per
    key: rank rows inside each key by the md5 of their id (+salt) and keep
    the ``k`` smallest.

    The distributed rendition of per-key reservoir sampling — and unlike a
    true streaming reservoir it is STABLE: re-runs, repartitioning, and
    incremental appends keep previously-sampled rows sampled (a row's rank
    only changes if a new row hashes below it), the same property
    ``hash_split`` buys for train/test splits. One shuffle on the key; the
    per-key window sorts only that key's rows. md5 (not xxhash64) so the
    selection is reproducible in any engine — the oracle checks WHICH rows
    are sampled, not just how many.
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(key).orderBy(h, id_col)
    # NULL-id rows are excluded (round 8, NULL-PK dirty class): md5(NULL)
    # is NULL, and a NULL rank key sorts FIRST in Spark but LAST in
    # ANSI-default engines — an id-less row would be "always sampled"
    # here and "never sampled" there. No stable identity → no stable
    # sample membership; callers triage NULL ids upstream.
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
