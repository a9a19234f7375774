"""Long ↔ wide reshaping (SURVEY.md §2.B Q7/Q8).

The reference's two OData dialects publish the *same* data in two shapes:
v3 `TypedDataSet` is wide (one column per measure), v4 `Observations` is
long/EAV (one row per measure value) — reference ``main.py:492-526``. These
operators convert between them.

Scale notes:
- ``long_to_wide`` REQUIRES an explicit measure list. Without it Spark runs
  an extra distinct() pass over the fact table to discover pivot values —
  a full scan + shuffle that is pure waste when the measure dictionary
  (reference `MeasureCodes`, 103 rows in fixtures) is known up front.
- ``wide_to_long`` is a zero-shuffle narrow transform (generate ×M rows per
  input row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def long_to_wide(
    df: DataFrame,
    group_keys: Sequence[str],
    measure_col: str,
    agg: Column,
    measures: Sequence[str],
) -> DataFrame:
    """v4-long → v3-wide pivot (reference Q7).

    ``measures`` is the explicit pivot-value list (from the measure
    dictionary); ``agg`` aggregates duplicate observations per cell — use an
    order-insensitive aggregate (sum/min/max), never bare first().
    """
    return df.groupBy(*group_keys).pivot(measure_col, list(measures)).agg(agg)


def wide_to_long(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    measure_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """v3-wide → v4-long unpivot (reference Q8) via the native ``unpivot``
    (Spark ≥3.4); values are cast to a common type by Spark."""
    return df.unpivot(
        list(id_cols), list(value_cols), measure_name, value_name
    )
