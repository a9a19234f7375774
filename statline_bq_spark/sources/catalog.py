"""Catalog layer: external-table registration and idempotent namespace
(re)creation over the Spark SQL catalog.

Spark-first rendition of the reference's BigQuery layer (``gcpl.py``):

- S20 dataset delete+create  (``gcpl.py:339-393,432-469,549-573``):
  `DROP DATABASE ... CASCADE` + `CREATE DATABASE` — idempotent overwrite.
- S21 external tables        (``gcpl.py:472-603``): per parquet dataset,
  `CREATE TABLE ... USING PARQUET LOCATION ...` — zero-copy, exactly like
  BigQuery external tables over GCS (``ExternalConfig("PARQUET")``,
  ``gcpl.py:592-596``).
- S22 column descriptions    (``gcpl.py:232-288``): column comments patched
  onto the registered main table via ALTER TABLE ... ALTER COLUMN.

Namespace naming follows the reference: ``{source}_{vN}_{id}``
(``gcpl.py:549-556``); table ids are the third dot-segment of the file name
``{source}.{vN}.{id}_{table}`` (``gcpl.py:589``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from statline_bq_spark.functions.cleaning import DESCRIPTION_MAX_CHARS


def namespace_name(source: str, odata_version: str, dataset_id: str) -> str:
    return f"{source}_{odata_version}_{dataset_id}"


def table_id_from_file_name(file_name: str) -> str:
    """``{source}.{vN}.{id}_{table}`` → ``{id}_{table}`` (reference
    ``gcpl.py:589``: ``str(name).split(".")[2]``)."""
    return file_name.split(".")[2]


def recreate_namespace(
    spark: SparkSession, namespace: str, *, description: str | None = None
) -> None:
    """Idempotent drop-cascade + create (reference S20)."""
    spark.sql(f"DROP DATABASE IF EXISTS `{namespace}` CASCADE")
    comment = f" COMMENT '{_sql_escape(description)}'" if description else ""
    spark.sql(f"CREATE DATABASE `{namespace}`{comment}")


def register_external_table(
    spark: SparkSession, namespace: str, table: str, parquet_path: str
) -> None:
    """Zero-copy external table over an existing Parquet dataset
    (reference S21)."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{namespace}`.`{table}` "
        f"USING PARQUET LOCATION '{parquet_path}'"
    )


def register_dataset_tables(
    spark: SparkSession,
    namespace: str,
    files: dict[str, str],
    *,
    description: str | None = None,
) -> list[str]:
    """Register every ``{file_name: parquet_path}`` under a freshly
    recreated namespace; returns the registered table names (reference
    orchestration ``gcpl.py:549-603``)."""
    recreate_namespace(spark, namespace, description=description)
    registered = []
    for file_name, path in sorted(files.items()):
        table = table_id_from_file_name(file_name)
        register_external_table(spark, namespace, table, path)
        registered.append(table)
    return registered


def patch_column_descriptions(
    spark: SparkSession,
    namespace: str,
    table: str,
    descriptions: dict[str, str],
    *,
    max_chars: int = DESCRIPTION_MAX_CHARS,
) -> int:
    """Comment each column with its (truncated) description — reference S22
    (``gcpl.py:232-288``), honoring the 1024-char cap of S13
    (``statline.py:369-374``). Returns #columns patched."""
    cols = {f.name for f in spark.table(f"`{namespace}`.`{table}`").schema.fields}
    patched = 0
    for col, desc in descriptions.items():
        if col not in cols or desc is None:
            continue
        clean = desc.replace("\n", "").replace("\r", "")
        if len(clean) > max_chars:
            clean = clean[: max_chars - 4] + "..."
        spark.sql(
            f"ALTER TABLE `{namespace}`.`{table}` "
            f"ALTER COLUMN `{col}` COMMENT '{_sql_escape(clean)}'"
        )
        patched += 1
    return patched


def _sql_escape(s: str | None) -> str:
    return (s or "").replace("'", "''")
