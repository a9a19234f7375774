"""Data-quality constraint checks (dbt-test / Delta-constraint style).

The reference trusts its source (schema-once enforcement is its only
guard); a production pipeline validates landed data before publishing.
Each check compiles to a conditional aggregate, so ANY number of checks on
one table costs exactly ONE scan + one map-side-combinable aggregate —
violations are counted, not materialized (a 100 TB table with a billion
bad rows still returns one summary row per check).

Referential integrity is the exception: it needs the dimension side, and
joins it as a broadcast/left-anti count.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violated`` is a boolean Column that is True
    on rows BREAKING the constraint."""

    name: str
    violated: Column


def not_null(col: str) -> Check:
    return Check(f"not_null_{col}", F.col(col).isNull())


def accepted_values(col: str, values: Sequence) -> Check:
    return Check(
        f"accepted_values_{col}",
        ~F.col(col).isin(*values) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range_{col}",
        (F.col(col) < lo) | (F.col(col) > hi) | F.col(col).isNull(),
    )


def expression(name: str, violated_when: Column) -> Check:
    return Check(name, violated_when)


def validate(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run every row-level check in ONE aggregate pass.

    Output: (check_name, n_violations, passed) — one row per check, unpivoted
    so downstream gates read it uniformly.
    """
    agg = df.agg(
        F.count(F.lit(1)).alias("_total"),
        *[
            # coalesce: sum() over an EMPTY table is NULL, which would make
            # n_violations/passed NULL — an empty (e.g. truncated-upstream)
            # table must read as 0 violations, not as an unreadable verdict
            F.coalesce(F.sum(F.when(c.violated, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"_v{i}")
            for i, c in enumerate(checks)
        ],
    )
    stacked = agg.select(
        F.expr(
            f"stack({len(checks)}, "
            + ", ".join(f"'{c.name}', _v{i}" for i, c in enumerate(checks))
            + ") as (check_name, n_violations)"
        )
    )
    return stacked.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def unique_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Duplicate-key report: (key cols..., n_copies) for keys appearing
    more than once — the uniqueness test, as a groupBy (one shuffle on the
    key, counts only)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def referential_violations(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Foreign-key test: fact rows whose key has no dimension partner,
    counted per missing key (left-anti join; the dim side broadcasts when
    bounded, AQE decides otherwise)."""
    return (
        fact.join(dim, fact[fact_key] == dim[dim_key], "left_anti")
        .groupBy(fact_key)
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
