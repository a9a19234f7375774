"""Streaming operational monitors: the anomaly detector as an incremental
pipeline.

The batch form (`operators.timeseries.anomaly_flags` over
`hourly_counts`) needs the full history per key; a stream can't window
over its own aggregates. The standard two-stage shape splits the work by
algebra:

1. **Incremental stage** (per micro-batch, tiny state): each batch emits
   its per-(key, hour) partial counts, appended to a counts store.
   Integer counts are associative, so partials from any batch slicing
   re-aggregate to exactly the one-pass result — hours split across
   micro-batches merge losslessly.
2. **Finalize stage** (on demand / per trigger): re-aggregate the counts
   store and run the SAME `anomaly_flags` the batch query uses. Sharing
   the flag operator is what makes the batch DuckDB oracle meaningful for
   the streaming pipeline — the stream is checked by construction, not by
   a parallel implementation.

At scale the counts store is partitioned by hour-range and compacted like
any dated snapshot (plans/layout.py); the finalize pass reads #keys×#hours
rows, never raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from statline_bq_spark.operators import timeseries


def hourly_anomaly_monitor(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    counts_dir: str,
    checkpoint_dir: str,
    *,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    available_now: bool = True,
) -> StreamingQuery:
    """Stage 1: watch ``source_dir`` for event drops and append per-batch
    partial hourly counts to ``counts_dir`` (checkpoint-tracked, so each
    input file contributes exactly once)."""
    keys = list(keys)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        timeseries.hourly_counts(batch, ts_col, keys).write.mode(
            "append"
        ).parquet(counts_dir)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize_anomalies(
    spark: SparkSession,
    counts_dir: str,
    *,
    keys: Sequence[str] = ("event_type",),
    **flag_kwargs,
) -> DataFrame:
    """Stage 2: merge the partial counts (associative integer sum) and run
    the shared batch flag operator."""
    keys = list(keys)
    merged = (
        spark.read.parquet(counts_dir)
        .groupBy(*keys, "_hb")
        .agg(F.sum("n_events").cast("bigint").alias("n_events"))
    )
    return timeseries.anomaly_flags(merged, keys, **flag_kwargs)


def quality_monitor(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    report_dir: str,
    checkpoint_dir: str,
    checks,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming data-quality monitor: run the constraint checks
    (`functions.constraints`) on every micro-batch and append the per-batch
    violation counts. Counts are associative, so the finalize merge equals
    one batch pass over all data — same split-by-algebra shape as
    `hourly_anomaly_monitor`."""
    from statline_bq_spark.functions import constraints as cq

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        cq.validate(batch, checks).select(
            "check_name", "n_violations"
        ).write.mode("append").parquet(report_dir)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize_quality(spark: SparkSession, report_dir: str) -> DataFrame:
    """Merge per-batch violation counts into the uniform
    (check_name, n_violations, passed) report."""
    merged = (
        spark.read.parquet(report_dir)
        .groupBy("check_name")
        .agg(F.sum("n_violations").cast("bigint").alias("n_violations"))
    )
    return merged.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def funnel_monitor(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    counters_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming quality-funnel monitor: run the Gopher-style rule cascade
    (`functions.funnel`) on every document micro-batch and append the
    batch's ONE-ROW stage counters. Rule outcomes are per-row flags, so
    counter rows merge by addition — same split-by-algebra shape as the
    other monitors, and the finalize report equals the batch query
    (`workload.q_gopher_quality_funnel`) by construction."""
    from statline_bq_spark.functions import funnel

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        funnel.funnel_counters(batch, text_col).write.mode("append").parquet(
            counters_dir
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize_funnel(spark: SparkSession, counters_dir: str) -> DataFrame:
    """Merge per-batch funnel counters into the 5-row funnel report."""
    from statline_bq_spark.functions import funnel

    return funnel.report_from_counters(spark.read.parquet(counters_dir))


def distinct_monitor(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sketch_dir: str,
    checkpoint_dir: str,
    *,
    keys: Sequence[str] = ("event_type",),
    value_col: str = "user_id",
    lg_k: int = 14,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming distinct-count monitor on MERGEABLE HLL sketches: each
    micro-batch appends its per-key partial sketch binaries; the sketch
    union is associative and order-insensitive (per-register max), so the
    finalized estimate is IDENTICAL to a single batch pass over all data
    — not merely close. This is the streaming rendition of the
    `hll_user_sketches` rollup: state per key is a fixed 2^lg_k-register
    binary, so a day of appends costs |keys| × sketch bytes, never raw
    events."""
    keys = list(keys)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.groupBy(*keys).agg(
            F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sk")
        ).write.mode("append").parquet(sketch_dir)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize_distinct(
    spark: SparkSession, sketch_dir: str, *, keys: Sequence[str] = ("event_type",)
) -> DataFrame:
    """Union-merge the per-batch sketches and estimate per key."""
    keys = list(keys)
    return (
        spark.read.parquet(sketch_dir)
        .groupBy(*keys)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("n_distinct_est")
        )
    )
