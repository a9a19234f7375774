"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-schema aggregation on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator workload from
``statline_bq_spark.workload`` (one entry per implemented operator from
SURVEY.md §2, each oracle-checked against DuckDB at sf0.01 unless the op is
hash-based and therefore rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from statline_bq_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.q_star_schema_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; hash-based ops omitted →
    rows-only check."""
    return dict(workload.ORACLES)
