"""Structured Streaming surface: windowed aggregation with watermarks,
stateful dedup, and the incremental-ingest loop as a stream."""
