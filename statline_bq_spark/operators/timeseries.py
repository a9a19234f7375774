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

from pyspark.sql import Column, DataFrame
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
    """
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
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    *,
    start_alias: str = "session_start",
) -> DataFrame:
    """Session-window groupBy keyed on ``keys`` with inactivity ``gap``.

    Output: (*keys, session_start, *aggs) where session_start is the first
    event's timestamp formatted as a string.
    """
    out = df.groupBy(F.session_window(F.col(ts_col), gap).alias("_w"), *keys).agg(
        F.min(ts_col).alias("_first_ts"), *aggs
    )
    agg_cols = out.columns[2 + len(keys):]
    return out.select(
        *keys,
        F.date_format(F.col("_first_ts"), TS_FMT).alias(start_alias),
        *agg_cols,
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
    and roll them up.
    """
    out = df.groupBy(
        F.window(F.col(ts_col), size, slide).alias("_w"), *keys
    ).agg(*aggs)
    agg_cols = out.columns[1 + len(keys):]
    return out.select(
        F.date_format(F.col("_w.start"), TS_FMT).alias(start_alias),
        *keys,
        *agg_cols,
    )
