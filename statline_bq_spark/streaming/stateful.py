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


def running_user_totals(
    events: DataFrame, *, ttl_ms: int | None = 60 * 60 * 1000
) -> DataFrame:
    """Streaming per-user running (count, sum(value)) with idle expiry.

    ``events`` must be a *streaming* DataFrame with (user_id, value).
    Output mode must be ``update`` (one refreshed row per active user per
    trigger).

    ``ttl_ms`` is the inactivity expiry for abandoned keys (the state-size
    bound for a long-lived continuous query). Pass ``None`` for NoTimeout —
    REQUIRED for ``trigger(availableNow=True)`` replay/backfill runs:
    a pending processing-time timeout keeps the query triggering empty
    micro-batches until the timer fires (observed on Spark 4.1: a 1h TTL
    spins ~1h of empty batches after the last file is consumed), so an
    availableNow run with a TTL never terminates in bounded time. Timeouts
    can't fire mid-run in a single-pass backfill anyway — expiry is a
    continuous-stream concern.

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
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
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
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


#: Output schema for :func:`user_type_counts`.
TYPE_COUNTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
    ]
)


def user_type_counts(
    events: DataFrame, *, ttl_ms: int | None = 60 * 60 * 1000
) -> DataFrame:
    """Streaming per-(user, event_type) running counts via
    ``applyInPandasWithState`` with a MAP-typed state column.

    Per-user state is a ``map<string,bigint>`` of event_type → running
    count; each trigger folds the arriving Arrow batches into the map and
    emits refreshed (user_id, event_type, n) rows for the types it touched
    (output mode ``update``). An inactivity timeout evicts abandoned users;
    pass ``ttl_ms=None`` (NoTimeout) for availableNow backfill runs — see
    :func:`running_user_totals` for why a pending processing-time timer
    keeps an availableNow query spinning empty batches until it fires.

    Scale: state partitioned by user in the executor-side state store
    (RocksDB in production), map size bounded by the event-type cardinality
    per user, Arrow batches bounded per key per trigger — nothing
    accumulates on the driver.

    See :func:`user_type_counts_tws` for the same operator on Spark 4's
    successor API ``transformWithStateInPandas`` (typed MapState + TTL),
    which needs the ``protobuf`` package at runtime.
    """

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        (counts,) = state.get if state.exists else ({},)
        counts = dict(counts) if counts else {}
        touched: set[str] = set()
        for pdf in pdfs:
            for et, cnt in pdf["event_type"].value_counts().items():
                counts[et] = counts.get(et, 0) + int(cnt)
                touched.add(et)
        state.update((counts,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = sorted(touched)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out),
                "event_type": out,
                "n": [counts[et] for et in out],
            }
        )

    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TYPE_COUNTS_SCHEMA,
            stateStructType="counts map<string,bigint>",
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def user_type_counts_tws(
    events: DataFrame, *, ttl_ms: int = 60 * 60 * 1000
) -> DataFrame:
    """Per-(user, event_type) running counts on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` with TYPED composite state primitives
    (Value/List/MapState) instead of one flat tuple.

    Here the per-user state is a ``MapState`` keyed by event_type; state
    carries a TTL so abandoned users cost nothing — the store evicts them
    without a timer round-trip.

    **Environment note**: the transformWithState state-server protocol is
    protobuf-based; the PRE_INIT driver worker crashes if ``google.protobuf``
    is not importable. This container has no protobuf, so this variant
    raises ImportError eagerly with a clear message (the query would
    otherwise die with an opaque "driver worker exited unexpectedly").
    :func:`user_type_counts` is the dependency-free equivalent.

    The processor class is defined as a closure so cloudpickle ships it by
    value (module-level classes pickle by reference and break on sessions
    that didn't ship this package).
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its state server speaks protobuf); install protobuf or use "
            "user_type_counts() which runs on applyInPandasWithState."
        ) from exc
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_type_counts_processor(ttl_ms=ttl_ms),
            outputStructType=TYPE_COUNTS_SCHEMA,
            outputMode="update",
            timeMode="ProcessingTime",
        )
    )


def make_type_counts_processor(*, ttl_ms: int = 60 * 60 * 1000):
    """Build the ``StatefulProcessor`` for :func:`user_type_counts_tws`.

    Defined as a factory (closure — cloudpickle ships it by value) and
    SEPARATE from the protobuf query gate so the processor's state logic
    is unit-testable without the TWS runtime: ``StatefulProcessor`` and
    ``StatefulProcessorHandle`` are plain Python ABCs; only the running
    query's state *server* needs protobuf. Tests drive
    ``init``/``handleInputRows`` against a fake MapState handle and check
    multi-batch accumulation (tests/test_streaming.py).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n bigint", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            touched: dict[str, int] = {}
            for pdf in rows:
                for et, cnt in pdf["event_type"].value_counts().items():
                    touched[et] = touched.get(et, 0) + int(cnt)
            out = []
            for et, add in sorted(touched.items()):
                prev = self._counts.getValue((et,))
                n = (prev[0] if prev else 0) + add
                self._counts.updateValue((et,), (n,))
                out.append((key[0], et, n))
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "event_type": [r[1] for r in out],
                    "n": [r[2] for r in out],
                }
            )

        def close(self) -> None:
            pass

    return TypeCounts()


def _tws_unavailable_reason() -> str | None:
    """Why transformWithState can't run here, or None if it can."""
    try:
        import google.protobuf  # noqa: F401

        return None
    except ImportError:
        return "google.protobuf not installed (required by the TWS state server)"
