"""statline_bq_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``dataverbinders/statline-bq``
ELT pipeline, rebuilt Spark-first.

The reference (see ``SURVEY.md``) ingests CBS StatLine OData datasets to
Parquet and publishes a star-schema SQL surface via BigQuery external tables.
This package re-expresses both layers natively on Spark:

- ``sources/``   — ingest: paged-scan planning, ndjson→parquet, external-table
                   registration, metadata/side-file handling (reference
                   ``statline.py`` / ``utils.py`` / ``gcpl.py``).
- ``operators/`` — the published query surface (star joins, pivots,
                   hierarchies, snapshots, windows) plus the north-star
                   LLM-data-pipeline operators (dedup, similarity, text,
                   multimodal) — all DataFrame/Catalyst, designed for
                   100 TB-scale partitioned execution.
- ``functions/`` — scalar column expressions (identifier cleaning,
                   description cleansing, text stats, vector math) that stay
                   JVM-side inside whole-stage codegen.
- ``streaming/`` — Structured Streaming renditions of the reference's
                   incremental-load semantics plus windowed aggregation.
- ``plans/``     — storage-layout conventions (date-partitioned staging,
                   latest-snapshot resolution).

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the public reference repo's observable behavior.
"""

__version__ = "0.1.0"
