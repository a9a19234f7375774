"""Analytic window-function operators.

The reference's only window-like computation is the poor-man's
``row_number`` in `_get_latest_folder` (reference `gcpl.py:53-97`); SURVEY.md
§2.C lists window functions as an engine-required category the reference
lacks. These operators provide the standard analytic surface — running
totals, lag deltas, moving averages, ranking/ntile — as thin factories over
``Window`` specs.

Scale design (100 TB): every operator shuffles once on its partition keys
and sorts within partitions; per-key state is bounded (running frames are
``rowsBetween`` with finite or growing-but-streaming frames, which Spark
evaluates in a single pass over the sorted partition, spilling via the
external sorter when a key's rows exceed memory). Never use an
unpartitioned window (a single global partition) — every factory here
requires partition keys for exactly that reason, except ``ntile_buckets``
which documents the constraint.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    value: Column | str,
    *,
    alias: str = "running_total",
) -> DataFrame:
    """Cumulative sum of ``value`` per partition in ``order_by`` order.

    Uses an explicit ``rowsBetween(unboundedPreceding, currentRow)`` frame:
    the default frame for an ordered window is RANGE-based, which both
    differs from most oracles on ties and forces a per-peer-group scan.
    ROWS frames stream in one pass.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))


def lag_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    value: Column | str,
    *,
    offset: int = 1,
    alias: str = "delta",
) -> DataFrame:
    """``value - lag(value, offset)`` per partition (None for the first rows)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    c = F.col(value) if isinstance(value, str) else value
    return df.withColumn(alias, c - F.lag(c, offset).over(w))


def moving_avg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    value: Column | str,
    *,
    preceding: int = 3,
    alias: str = "moving_avg",
) -> DataFrame:
    """Trailing moving average over the last ``preceding``+1 rows (ROWS frame)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, Window.currentRow)
    )
    return df.withColumn(alias, F.avg(value).over(w))


def running_frame_avg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    value: Column | str,
    *,
    preceding: int = 3,
    alias: str = "avg",
) -> DataFrame:
    """Trailing average as exact-sum / row-count over the frame.

    Use with a DECIMAL ``value`` when the result must be bit-reproducible
    across engines: double ``avg`` accumulates in frame-implementation
    order (incremental here, segment-tree elsewhere), so the last ulp — and
    therefore ``round(x, 2)`` at .xx5 boundaries — is engine-dependent.
    Decimal sums are exact, and double division by an integer count is a
    single deterministic operation.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, Window.currentRow)
    )
    return df.withColumn(
        alias,
        F.sum(value).over(w).cast("double") / F.count(F.lit(1)).over(w),
    )


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    *,
    dense: bool = False,
    alias: str = "rank",
) -> DataFrame:
    """rank()/dense_rank() per partition — deterministic under ties (equal
    inputs get equal ranks), unlike row_number over a non-unique order."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(alias, fn.over(w))


def ntile_buckets(
    df: DataFrame,
    order_by: Sequence[Column | str],
    *,
    n: int = 4,
    partition_by: Sequence[str] = (),
    alias: str = "bucket",
) -> DataFrame:
    """ntile(n) bucket assignment.

    With empty ``partition_by`` this is a GLOBAL window — one task sees all
    rows. Only use unpartitioned ntile on pre-aggregated/bounded inputs
    (e.g. per-customer summaries), never on a raw fact table; partition it
    or compute approximate quantile cut-points instead at full scale.

    ``order_by`` must be a total order (include a unique tiebreaker) or the
    bucket assignment of tied rows is nondeterministic.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, F.ntile(n).over(w))
