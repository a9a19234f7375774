"""ndjson → Parquet conversion with schema enforcement.

Spark-first rendition of reference S9 (``utils.py:118-132``): the reference
opens one ParquetWriter and appends page-by-page with the schema either
declared or inferred from the *first* file only, then enforced on every
later page (``ParseOptions(explicit_schema=...)`` at ``utils.py:123-129``).

In Spark the whole loop collapses to one declarative read→write: JSON Lines
is ``spark.read.json``'s native input, schema enforcement is
``.schema(...)``, and parallel conversion + bounded memory come from the
engine. The "infer from first file only" policy is preserved as an explicit
helper because silent per-file inference drift is the failure mode the
reference guards against (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import NullType, StringType, StructType


def sanitize_null_types(schema: StructType) -> StructType:
    """Replace NullType (VOID) fields with string.

    An all-null column infers as NullType, which Parquet cannot store and
    most operators reject. The reference hits the same case (all-null
    ``ParentID`` in the DataProperties fixture lands as Arrow ``null``) and
    its EDM mapping policy is "unmapped type → string"
    (``statline.py:304-306``); we apply the same policy to inferred VOIDs
    (SURVEY.md §7 risk register).
    """
    fields = [
        f.__class__(f.name, StringType(), True, f.metadata)
        if isinstance(f.dataType, NullType)
        else f
        for f in schema.fields
    ]
    return StructType(fields)


def infer_schema_from_first_file(
    spark: SparkSession, files: list[str]
) -> StructType:
    """Schema-once policy: infer from the first ndjson file only (reference
    ``utils.py:123-126``), then callers enforce it everywhere. All-null
    columns degrade to string via :func:`sanitize_null_types`."""
    if not files:
        raise ValueError("no ndjson files to infer from")
    return sanitize_null_types(spark.read.json(files[0]).schema)


def ndjson_to_parquet(
    spark: SparkSession,
    files: list[str],
    out_path: str,
    schema: StructType | None = None,
    *,
    mode: str = "overwrite",
) -> DataFrame:
    """Convert ndjson files to one Parquet dataset under ``out_path``.

    ``schema=None`` applies the first-file inference policy; a declared
    schema (e.g. from ``odata.edm_schema_to_struct``) is enforced on every
    file — rows missing a declared column become null, matching the
    reference's explicit_schema behavior.
    Returns the DataFrame re-read from the written Parquet.
    """
    if schema is None:
        schema = infer_schema_from_first_file(spark, files)
    df = spark.read.schema(schema).json(files)
    df.write.mode(mode).parquet(out_path)
    return spark.read.parquet(out_path)
