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
from collections.abc import Sequence

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
    """Distinct YYYYMMDD snapshot folders (reference S17's blob-list + set).

    URI storage roots (``file://``, ``gs://``, ``s3://`` — reference S16's
    GCS bucket, ``gcpl.py:53-97``) are listed through ``pyarrow.fs``, the
    same scheme resolution ``sources.metadata.write_metadata`` uses for the
    side files, so one ``storage_root`` value serves parquet, metadata, and
    snapshot listing alike."""
    base = dataset_root(root, source, odata_version, dataset_id)
    if "://" in base:
        import pyarrow.fs as pafs

        fs, dir_p = pafs.FileSystem.from_uri(base)
        sel = pafs.FileSelector(dir_p, allow_not_found=True)
        return sorted(
            info.base_name
            for info in fs.get_file_info(sel)
            if info.type == pafs.FileType.Directory
            and re.fullmatch(r"\d{8}", info.base_name)
        )
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


def compact_snapshot(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 512 * 1024 * 1024,
    max_records_per_file: int | None = None,
) -> int:
    """Compact a parquet directory's small files into ~``target_file_bytes``
    files; returns the new file count.

    Paged ingest (reference S6/S9: one ndjson per 10k/100k-row page) and
    streaming micro-batches both leave a long tail of small files; at
    100 TB the footer-read cost alone of millions of tiny files dominates
    scan setup. Sizing comes from the ON-DISK compressed bytes (what the
    next scan actually pays), not row counts. A full ``repartition`` (not
    ``coalesce``) is used so output files are evenly sized even when the
    input tail is skewed — the one extra shuffle is the point of the op.

    The rewrite goes to a sibling temp dir, then swaps in — Spark cannot
    safely overwrite a directory it is currently reading. URI roots
    (``file://``, ``gs://``, ``s3://``) go through ``pyarrow.fs`` like the
    rest of the layout module; note the swap is copy-free only on
    rename-capable stores (local, HDFS) — object stores fake renames, so
    there the move costs one extra pass, which is inherent to compaction
    on such stores.
    """
    import shutil

    # Self-heal a crash from a previous run BEFORE touching anything: the
    # swap below is rename(path -> .compact.old); rename(.compact.tmp ->
    # path); delete(.compact.old). A crash between the two renames leaves
    # .compact.old as the ONLY copy of the data (canonical path missing) —
    # rename it back. A crash after the second rename leaves .compact.old
    # as confirmed garbage beside a healthy canonical path — delete it so
    # the next swap's first rename doesn't fail on an existing destination.
    old = path.rstrip("/") + ".compact.old"
    if "://" in path:
        import pyarrow.fs as pafs

        fs, dir_p = pafs.FileSystem.from_uri(path)
        _, old_p = pafs.FileSystem.from_uri(old)
        old_exists = fs.get_file_info(old_p).type != pafs.FileType.NotFound
        if old_exists:
            if fs.get_file_info(dir_p).type == pafs.FileType.NotFound:
                fs.move(old_p, dir_p)
            else:
                fs.delete_dir(old_p)
    elif os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)

    if "://" in path:
        import pyarrow.fs as pafs

        fs, dir_p = pafs.FileSystem.from_uri(path)
        total = sum(
            info.size
            for info in fs.get_file_info(
                pafs.FileSelector(dir_p, recursive=True)
            )
            if info.is_file and info.base_name.endswith(".parquet")
        )
    else:
        total = sum(
            os.path.getsize(os.path.join(dirpath, f))
            for dirpath, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, -(-total // target_file_bytes))
    tmp = path.rstrip("/") + ".compact.tmp"
    writer = spark.read.parquet(path).repartition(n_files).write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(tmp)
    # Swap order matters for crash-safety: park the OLD data in a second
    # temp first, move the new data into the canonical path, THEN delete
    # the old. A crash mid-swap leaves at worst the canonical path briefly
    # absent between the two renames (unavoidable without a real atomic
    # dir-swap), but BOTH copies survive on disk (.compact.tmp and
    # .compact.old), so recovery is a single rename — never data loss.
    # The previous delete-then-move order had a window where the only
    # copy lived in the temp sibling; on object stores, whose fake
    # renames are slow full copies, that window was wide. The entry
    # self-heal above performs the recovery rename if this run crashes.
    if "://" in path:
        import pyarrow.fs as pafs

        fs, dir_p = pafs.FileSystem.from_uri(path)
        _, tmp_p = pafs.FileSystem.from_uri(tmp)
        _, old_p = pafs.FileSystem.from_uri(old)
        fs.move(dir_p, old_p)
        fs.move(tmp_p, dir_p)
        fs.delete_dir(old_p)
    else:
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    return n_files


def expire_snapshots(
    root: str,
    source: str,
    odata_version: str,
    dataset_id: str,
    *,
    keep_latest: int = 3,
    older_than: str | None = None,
) -> list[str]:
    """Retention for dated snapshots (the lifecycle half of S15/S17 the
    reference leaves to manual cleanup): delete snapshot folders beyond the
    newest ``keep_latest``, optionally only those strictly older than
    ``older_than`` (YYYYMMDD). Returns the deleted dates. The newest
    snapshot is never deleted regardless of arguments — the "latest"
    readers (S17) must always have a target."""
    import shutil

    if keep_latest < 1:
        raise ValueError("keep_latest must be >= 1")
    dates = list_snapshot_dates(root, source, odata_version, dataset_id)
    victims = dates[:-keep_latest] if keep_latest < len(dates) else []
    if older_than is not None:
        victims = [d for d in victims if d < older_than]
    base = dataset_root(root, source, odata_version, dataset_id)
    if "://" in base:
        import pyarrow.fs as pafs

        fs, dir_p = pafs.FileSystem.from_uri(base)
        for d in victims:
            fs.delete_dir(f"{dir_p}/{d}")
        return victims
    for d in victims:
        shutil.rmtree(os.path.join(base, d))
    return victims


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


def snapshot_date_asof(
    root: str,
    source: str,
    odata_version: str,
    dataset_id: str,
    asof: str,
) -> str | None:
    """Latest snapshot date ≤ ``asof`` (YYYYMMDD) — time travel over the
    dated folder layout: the newest snapshot that already existed at the
    given date. Plain string comparison is correct for zero-padded
    YYYYMMDD."""
    if not re.fullmatch(r"\d{8}", asof):
        raise ValueError(f"asof must be YYYYMMDD, got {asof!r}")
    dates = [
        d
        for d in list_snapshot_dates(root, source, odata_version, dataset_id)
        if d <= asof
    ]
    return dates[-1] if dates else None


def read_snapshot_asof(
    spark: SparkSession,
    root: str,
    source: str,
    odata_version: str,
    dataset_id: str,
    table: str,
    asof: str,
) -> DataFrame:
    """Read a table AS OF a date: the newest snapshot ≤ ``asof``. The
    dated-folder resolution happens driver-side on directory names — no
    data is listed or read for newer or older snapshots (the same pruning
    economics as ``read_latest_snapshot``)."""
    date = snapshot_date_asof(root, source, odata_version, dataset_id, asof)
    if date is None:
        raise FileNotFoundError(
            f"no snapshot at or before {asof} under "
            f"{dataset_root(root, source, odata_version, dataset_id)}"
        )
    return spark.read.parquet(
        os.path.join(
            snapshot_dir(root, source, odata_version, dataset_id, date), table
        )
    ).withColumn("load_date", F.lit(date))


def write_clustered(
    df,
    path: str,
    cluster_cols: Sequence[str],
    *,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on ``cluster_cols``: range-repartition so
    each output file owns a disjoint key range, then sort within
    partitions so every ROW GROUP's min/max stats are tight.

    This is the data-layout lever scan pruning needs at 100 TB: parquet
    readers (Spark, DuckDB, Trino) skip whole row groups whose min/max
    exclude the predicate, but only if the writer clustered the data —
    an unsorted write leaves every row group spanning the full key range
    and every filter reads everything. Range partitioning (vs hash) also
    makes file-level pruning work for range predicates, and the
    per-partition sort is a no-spill local sort (each partition already
    owns a narrow range).

    The same layout is what makes a later merge/as-of join cheap: both
    sides clustered on the join key zip through sorted runs.
    """
    out = df.repartitionByRange(
        *( [n_files] if n_files else [] ), *cluster_cols
    ).sortWithinPartitions(*cluster_cols)
    out.write.mode(mode).parquet(path)
