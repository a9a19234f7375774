"""Time-windowed aggregation operators over event tables.

Batch renditions of the Structured Streaming windows (``streaming/`` holds
the streaming versions with watermarks). Both share these semantics, so the
batch form doubles as the oracle-checkable surface:

- tumbling window: ``F.window(ts, size)`` — fixed, non-overlapping buckets.
- session window: ``F.session_window(ts, gap)`` — a session extends while
  successive events arrive within ``gap`` of the session end; an event at
  exactly ``end`` starts a new session (window intervals are end-exclusive).

Timestamps are exposed as formatted strings (not raw timestamps) so results
are timezone- and precision-stable across engines. This is the engine's
counterpart of the reference's date-folder snapshots (reference
``utils.py:219-223``: time is carried as formatted strings, not native
timestamps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    *,
    start_alias: str = "window_start",
) -> DataFrame:
    """Tumbling-window groupBy: (window_start, *keys) → pre-aliased aggs.

    One shuffle on (window, keys); partial aggregation runs map-side, so the
    shuffle volume is #groups, not #events — the property that keeps this
    viable on an unbounded event log.

    Clock-less events (NULL ts) are excluded EXPLICITLY: ``F.window`` would
    drop them silently anyway; the filter makes the contract visible (and
    keeps oracle SQL, which buckets NULL into a NULL group, honest).
    """
    df = df.filter(F.col(ts_col).isNotNull())
    out = df.groupBy(F.window(F.col(ts_col), size).alias("_w"), *keys).agg(*aggs)
    agg_cols = out.columns[1 + len(keys):]
    return out.select(
        F.date_format(F.col("_w.start"), TS_FMT).alias(start_alias),
        *keys,
        *agg_cols,
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str | Column,
    keys: Sequence[str],
    aggs: Sequence[Column],
    *,
    start_alias: str = "session_start",
) -> DataFrame:
    """Session-window groupBy keyed on ``keys`` with inactivity ``gap``.

    ``gap`` may be a fixed interval string or a Column expression producing
    per-row interval strings (Spark's dynamic gap duration, e.g.
    ``F.when(col("type") == "click", "10 minutes").otherwise("1 hour")``) —
    sessions then time out at a rate chosen by the row's attributes.

    Output: (*keys, session_start, *aggs) where session_start is the first
    event's timestamp formatted as a string. Clock-less events (NULL ts)
    are excluded — they cannot be placed in any session.
    """
    df = df.filter(F.col(ts_col).isNotNull())
    out = df.groupBy(F.session_window(F.col(ts_col), gap).alias("_w"), *keys).agg(
        F.min(ts_col).alias("_first_ts"), *aggs
    )
    agg_cols = out.columns[2 + len(keys):]
    return out.select(
        *keys,
        F.date_format(F.col("_first_ts"), TS_FMT).alias(start_alias),
        *agg_cols,
    )


def gap_fill_forward(
    df: DataFrame,
    ts_col: str,
    step: str,
    key: str,
    value_col: str,
    *,
    start_alias: str = "window_start",
    count_alias: str = "n_events",
    fill_alias: str = "filled_value",
    domain: tuple[str, str] | None = None,
) -> DataFrame:
    """Resample to a dense per-key time grid and forward-fill the last value.

    The missing half of windowed aggregation: ``tumbling_agg`` only emits
    buckets that contain events, but downstream consumers (charting,
    change-point detection, feature windows for training data) need a dense
    series. Steps:

    1. bucket events into ``step``-sized tumbles (one shuffle, map-side
       partial agg — shuffle volume is #groups, not #events);
    2. build the full time spine with ``sequence(min, max, step)`` over a
       single global-bounds row, exploded — the spine is #buckets rows
       regardless of input size;
    3. cross the spine with the distinct key values (taken from the bucketed
       aggregate — no extra scan); the grid→bucketed left join broadcasts
       the bucketed aggregate (#keys × #non-empty-buckets rows, the only
       build side Spark's broadcast hash join allows for a left outer);
    4. forward-fill gaps with ``last(value, ignorenulls=True)`` over an
       UNBOUNDED PRECEDING row frame per key.

    At 100 TB the only full-data pass is step 1; everything after runs on
    #keys × #buckets rows. The per-key window in step 4 assumes #buckets per
    key fits one task (time grids do: a decade of hours is 87k rows); if
    keys are few and grids huge, range-partition on (key, coarse-time) and
    fill per segment carrying the last value across boundaries.

    Rows before a key's first observation keep NULL in ``fill_alias`` —
    there is nothing to carry forward; oracle behavior (DuckDB
    ``last_value(x IGNORE NULLS)``) matches. Clock-less events (NULL ts)
    are excluded — they belong to no bucket.

    ``domain=(lo, hi)`` (ISO timestamps, half-open) bounds the VALID time
    range; rows outside it are treated as corrupt clocks and excluded
    like NULL ts. This is the grid-explosion guard: the spine is
    ``(max-min)/step`` rows, so a single mis-parsed 1905 or 2262
    timestamp in a 100 TB event log would inflate an hourly spine by six
    orders of magnitude (and the per-key fill window with it) — a dense
    resample must bound its grid to the business-valid domain, not trust
    every clock in the data.
    """
    interval = F.expr(f"INTERVAL {step}")
    df = df.filter(F.col(ts_col).isNotNull())
    if domain is not None:
        df = df.filter(
            (F.col(ts_col) >= F.lit(domain[0]).cast("timestamp_ntz"))
            & (F.col(ts_col) < F.lit(domain[1]).cast("timestamp_ntz"))
        )
    bucketed = (
        df.groupBy(F.window(F.col(ts_col), step).alias("_w"), key)
        .agg(
            F.count(F.lit(1)).alias(count_alias),
            F.round(F.sum(value_col), 2).alias("_v"),
        )
        .select(F.col("_w.start").alias("_gf_bucket"), key, count_alias, "_v")
    )
    # Bounds and distinct keys come from the (small) bucketed aggregate, not
    # from a rescan of df — the only full-data pass is the groupBy above.
    # Deriving min/max of the already-windowed bucket starts also sidesteps
    # Spark's "multiple time window expressions" restriction.
    bounds = bucketed.select(
        F.min("_gf_bucket").alias("_gf_lo"), F.max("_gf_bucket").alias("_gf_hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("_gf_lo", "_gf_hi", interval)).alias("_gf_bucket")
    )
    keys = bucketed.select(key).distinct()
    grid = spine.crossJoin(keys)
    fill_w = (
        Window.partitionBy(key)
        .orderBy("_gf_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null-safe on the key: a NULL key is a series like any other (groupBy
    # and the grid both carry it); plain equality would leave its grid rows
    # permanently unmatched — the series' observations silently read as
    # all-gaps
    b = bucketed.withColumnRenamed(key, "_gf_k").withColumnRenamed(
        "_gf_bucket", "_gf_b"
    )
    return (
        grid.join(
            F.broadcast(b),
            (F.col("_gf_bucket") == F.col("_gf_b"))
            & F.col(key).eqNullSafe(F.col("_gf_k")),
            "left",
        )
        .select(
            key,
            F.date_format("_gf_bucket", TS_FMT).alias(start_alias),
            F.coalesce(F.col(count_alias), F.lit(0)).alias(count_alias),
            F.last("_v", ignorenulls=True).over(fill_w).alias(fill_alias),
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    *,
    start_alias: str = "window_start",
) -> DataFrame:
    """Sliding-window groupBy: windows of ``size`` every ``slide``.

    ``F.window(ts, size, slide)`` replicates each event into
    size/slide overlapping windows before the aggregation — shuffle volume
    is (#groups × size/slide), the unavoidable cost of overlap; keep the
    ratio small (2-4×) at scale or pre-aggregate to ``slide``-sized tumbles
    and roll them up. Clock-less events (NULL ts) are excluded explicitly.
    """
    df = df.filter(F.col(ts_col).isNotNull())
    out = df.groupBy(
        F.window(F.col(ts_col), size, slide).alias("_w"), *keys
    ).agg(*aggs)
    agg_cols = out.columns[1 + len(keys):]
    return out.select(
        F.date_format(F.col("_w.start"), TS_FMT).alias(start_alias),
        *keys,
        *agg_cols,
    )


def hourly_counts(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    *,
    bucket_alias: str = "_hb",
    count_alias: str = "n_events",
) -> DataFrame:
    """Per-(keys, epoch-hour) event counts — the mergeable partial every
    monitoring pipeline accumulates (integer counts sum associatively, so
    micro-batch partials re-aggregate losslessly: ``groupBy.sum`` over
    appended partials equals one batch pass)."""
    return df.groupBy(
        *keys,
        F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
        .cast("bigint")
        .alias(bucket_alias),
    ).agg(F.count(F.lit(1)).alias(count_alias))


def anomaly_flags(
    hourly: DataFrame,
    keys: Sequence[str],
    *,
    bucket_col: str = "_hb",
    count_col: str = "n_events",
    lookback_hours: int = 24,
    min_lookback: int = 12,
    sigmas: int = 3,
) -> DataFrame:
    """Trailing-window z-score flags over per-key hourly counts.

    RANGE frame on the integer hour index (ROWS frames silently shrink the
    lookback across gaps), current hour excluded, ``min_lookback`` observed
    hours required before judging. The k-sigma test compares
    (x-mean)² > k²·var — no square root, no rounding step, so the flag is
    bit-deterministic given integer counts. Shared by the batch query and
    the streaming monitor (``streaming.monitors``), which is what makes
    the batch oracle meaningful for the stream.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rangeBetween(-lookback_hours, -1)
    )
    stats = hourly.select(
        *keys,
        bucket_col,
        count_col,
        F.count(F.lit(1)).over(w).alias("_k"),
        F.sum(count_col).over(w).alias("_s"),
        F.sum(F.col(count_col) * F.col(count_col)).over(w).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_k")
    var = F.col("_ss").cast("double") / F.col("_k") - mean * mean
    dev = F.col(count_col) - mean
    return stats.select(
        *keys,
        F.date_format(
            F.timestamp_seconds(F.col(bucket_col) * 3600), TS_FMT
        ).alias("hour_start"),
        count_col,
        F.col("_k").alias("n_lookback_hours"),
        F.when(
            (F.col("_k") >= min_lookback) & (dev * dev > sigmas * sigmas * var),
            True,
        )
        .otherwise(False)
        .alias("is_anomaly"),
    )


def gap_fill_linear(
    df: DataFrame,
    ts_col: str,
    step: str,
    key: str,
    value_col: str,
    *,
    start_alias: str = "window_start",
    fill_alias: str = "interp_value",
    domain: tuple[str, str] | None = None,
) -> DataFrame:
    """Dense per-key grid with LINEAR interpolation across interior gaps.

    Same grid construction as :func:`gap_fill_forward` (one full-data
    tumbling pass; spine/keys/bounds derived from the small bucketed
    aggregate), but missing buckets take
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` between
    their nearest observed neighbours instead of carrying the last value.
    Leading/trailing buckets (before a key's first or after its last
    observation) stay NULL — there is nothing to interpolate toward.

    Window shape: two ROWS-frame passes per key (last-non-null looking
    back, first-non-null looking forward) over #buckets rows — streaming
    one-pass frames, no re-sort between them (same ordering). The
    interpolation fraction uses bucket epoch seconds, so the arithmetic
    is identical in any engine (integers into one double divide).
    Clock-less events (NULL ts) are excluded — they belong to no bucket.
    ``domain=(lo, hi)`` bounds the valid time range exactly as in
    :func:`gap_fill_forward` (the grid-explosion guard).
    """
    interval = F.expr(f"INTERVAL {step}")
    df = df.filter(F.col(ts_col).isNotNull())
    if domain is not None:
        df = df.filter(
            (F.col(ts_col) >= F.lit(domain[0]).cast("timestamp_ntz"))
            & (F.col(ts_col) < F.lit(domain[1]).cast("timestamp_ntz"))
        )
    # Exact-decimal sum (partition-order-independent), cast to double
    # (exact: the scaled sum fits well under 2^53), THEN one divide and a
    # scaled-integer round. Decimal DIVISION is avoided on purpose — each
    # engine picks its own quotient scale, which re-rounds differently
    # near 4dp ties; double ops on identical inputs are bit-identical
    # everywhere, and round-to-integer only disagrees on exact .5 doubles
    # where both engines round away from zero.
    # NULL, NaN and out-of-quantization-domain values are failed
    # measurements, not observations: the ANSI decimal cast maps NaN/Inf
    # to NULL but THROWS on a finite 1e300 (NUMERIC_VALUE_OUT_OF_RANGE),
    # so the |x| < 1e14 guard must run BEFORE the cast. The sum skips
    # the NULLs, and count(_obs) — not count(*) — keeps the mean over
    # observed values only. An all-failed bucket divides 0 observations
    # via try_divide -> NULL _v, i.e. the bucket is simply 'missing' and
    # the interpolation bridges it like any other gap.
    _v_raw = F.col(value_col)
    obs = F.when(
        ~F.isnan(_v_raw) & (F.abs(_v_raw) < F.lit(1e14)), _v_raw
    ).cast("decimal(20,6)")
    bucketed = (
        df.groupBy(F.window(F.col(ts_col), step).alias("_w"), key)
        .agg(
            (
                F.round(
                    F.try_divide(
                        F.sum(obs).cast("double"), F.count(obs)
                    )
                    * 10000.0,
                    0,
                )
                / 10000.0
            ).alias("_v")
        )
        .select(F.col("_w.start").alias("_gl_bucket"), key, "_v")
    )
    bounds = bucketed.select(
        F.min("_gl_bucket").alias("_gl_lo"), F.max("_gl_bucket").alias("_gl_hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("_gl_lo", "_gl_hi", interval)).alias("_gl_bucket")
    )
    keys = bucketed.select(key).distinct()
    grid = spine.crossJoin(keys)
    # null-safe on the key — same reasoning as gap_fill_forward's grid join
    b = bucketed.withColumnRenamed(key, "_gl_k").withColumnRenamed(
        "_gl_bucket", "_gl_b"
    )
    filled = grid.join(
        F.broadcast(b),
        (F.col("_gl_bucket") == F.col("_gl_b"))
        & F.col(key).eqNullSafe(F.col("_gl_k")),
        "left",
    ).drop("_gl_k", "_gl_b")

    t = F.unix_timestamp("_gl_bucket").cast("double")
    back = (
        Window.partitionBy(key)
        .orderBy("_gl_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key)
        .orderBy("_gl_bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_t = F.when(F.col("_v").isNotNull(), t)
    prev_v = F.last("_v", ignorenulls=True).over(back)
    prev_t = F.last(known_t, ignorenulls=True).over(back)
    next_v = F.first("_v", ignorenulls=True).over(fwd)
    next_t = F.first(known_t, ignorenulls=True).over(fwd)
    # Cross-engine determinism: every IEEE op on identical doubles is
    # bit-identical in any engine; the ONLY divergent op is decimal
    # rounding (Spark rounds the shortest decimal repr, DuckDB the exact
    # binary value — they disagree on near-tie 4dp values, which linear
    # interpolation of 4dp endpoints produces constantly). So interpolate
    # on 1e4-scaled values and round ONCE at integer precision, where the
    # engines agree, then scale back with an exact-by-construction divide.
    num = (prev_v * 10000.0) * (next_t - t) + (next_v * 10000.0) * (t - prev_t)
    den = next_t - prev_t
    interp = F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(
        F.round(num / den, 0) / F.lit(10000.0)
    )
    return filled.select(
        key,
        F.date_format("_gl_bucket", TS_FMT).alias(start_alias),
        interp.alias(fill_alias),
    )
