"""Ingest layer: the Spark-first rendition of the reference's ELT pipeline
(paged OData scans → ndjson → Parquet → catalog registration)."""
