"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only state is the per-dataset `Modified` stamp it compares
before re-ingesting (reference ``main.py:38-95``). The streaming engine
generalizes that to arbitrary per-key state kept by the Structured Streaming
state store. This module implements the canonical custom-stateful example a
data pipeline needs and the built-in windows can't express: a **running
per-key accumulator with inactivity expiry** — e.g. "events seen and value
accumulated per user so far; emit an updated row per batch; drop state for
users idle longer than the timeout".

Scale design: state lives in the executor-side state store partitioned by
the grouping key (RocksDB-backed in production configs), so state size
scales horizontally with keys/executors; the Arrow batches flowing through
the Pandas function are bounded per key per trigger. The timeout bounds
total state for abandoned keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema: one row per (key, trigger) with the running totals.
RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n_events bigint, total_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) with 1h idle expiry.

    ``events`` must be a *streaming* DataFrame with (user_id, value).
    Output mode must be ``update`` (one refreshed row per active user per
    trigger).

    The update function is defined as a closure on purpose: cloudpickle
    serializes closures BY VALUE, so executors' Python workers don't need
    this package importable — a module-level function would be pickled by
    reference and fail on any cluster (or driver session) that didn't ship
    the package via ``--py-files``.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # Fold this trigger's rows for one user into (n_events, total_value);
        # state round-trips through the Spark state store between triggers.
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(60 * 60 * 1000)  # 1h inactivity expiry
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
