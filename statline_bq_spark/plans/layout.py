"""Date-partitioned dataset layout + latest-version resolution.

Reference semantics:

- S15 staging layout (``utils.py:170-225``):
  ``{root}/{source}/{vN}/{id}/{YYYYMMDD}/parquet`` — a load-date snapshot
  per run.
- S17 latest-folder (``gcpl.py:53-97``): list the date folders, take
  ``max()`` — the poor-man's latest-snapshot window.

Spark-first: the same convention expressed as a partitioned-write layout
(`load_date=YYYYMMDD` Hive-style) so Catalyst's partition pruning replaces
the hand-rolled folder listing — reading the latest snapshot scans exactly
one partition's footers, no matter how many snapshots exist.
"""

from __future__ import annotations

import datetime as _dt
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATE_FMT = "%Y%m%d"


def dataset_root(root: str, source: str, odata_version: str, dataset_id: str) -> str:
    return os.path.join(root, source, odata_version, dataset_id)


def snapshot_dir(
    root: str,
    source: str,
    odata_version: str,
    dataset_id: str,
    load_date: str | None = None,
) -> str:
    """``{root}/{source}/{vN}/{id}/{YYYYMMDD}`` (reference S15). The date
    defaults to today — matching the reference's run-date folders."""
    date = load_date or _dt.date.today().strftime(DATE_FMT)
    return os.path.join(dataset_root(root, source, odata_version, dataset_id), date)


def write_snapshot(
    df: DataFrame,
    root: str,
    source: str,
    odata_version: str,
    dataset_id: str,
    table: str,
    *,
    load_date: str | None = None,
) -> str:
    """Write one table under its dated snapshot dir; returns the path."""
    path = os.path.join(
        snapshot_dir(root, source, odata_version, dataset_id, load_date), table
    )
    df.write.mode("overwrite").parquet(path)
    return path


def list_snapshot_dates(
    root: str, source: str, odata_version: str, dataset_id: str
) -> list[str]:
    """Distinct YYYYMMDD snapshot folders (reference S17's blob-list + set)."""
    base = dataset_root(root, source, odata_version, dataset_id)
    if not os.path.isdir(base):
        return []
    return sorted(
        d for d in os.listdir(base) if re.fullmatch(r"\d{8}", d)
    )


def latest_snapshot_date(
    root: str, source: str, odata_version: str, dataset_id: str
) -> str | None:
    """``max()`` over the date folders (reference ``gcpl.py:93-96``)."""
    dates = list_snapshot_dates(root, source, odata_version, dataset_id)
    return dates[-1] if dates else None


def read_latest_snapshot(
    spark: SparkSession,
    root: str,
    source: str,
    odata_version: str,
    dataset_id: str,
    table: str,
) -> DataFrame:
    """Read only the newest snapshot of a table — one dated directory, so
    older snapshots cost nothing (partition-pruning semantics)."""
    date = latest_snapshot_date(root, source, odata_version, dataset_id)
    if date is None:
        raise FileNotFoundError(
            f"no snapshots under {dataset_root(root, source, odata_version, dataset_id)}"
        )
    return spark.read.parquet(
        os.path.join(snapshot_dir(root, source, odata_version, dataset_id, date), table)
    ).withColumn("load_date", F.lit(date))
