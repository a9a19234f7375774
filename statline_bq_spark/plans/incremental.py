"""Incremental materialized-view maintenance over mergeable partial
aggregates.

The reference's incremental story is dataset-level: skip a whole dataset
when its ``Modified`` stamp is unchanged (reference ``main.py:38-95``).
This module generalizes that to ROW-level incremental aggregation — the
pattern a 100 TB warehouse actually runs: keep a grouped view as MERGEABLE
partial-aggregate state, and on each load fold ONLY the delta into the
state instead of rescanning history.

Algebra: an aggregate is incrementally maintainable iff its partial state
forms a commutative monoid under merge. Supported here:

- ``count``  — state n,   merge = sum
- ``sum``    — state s,   merge = sum
- ``min``    — state mn,  merge = min
- ``max``    — state mx,  merge = max
- ``avg``    — DERIVED at read time as sum/count (never stored: averages
  don't merge, sums and counts do)

``count_distinct`` is deliberately absent — distinct doesn't merge exactly
without keeping the full key set; use the mergeable HLL sketch rollup
(``workload.q_hll_user_sketches``) when approximate is acceptable.

Deletions/updates: out of scope for monoid state (min/max aren't
invertible). Handle upstream with snapshot semantics — rebuild the affected
partitions — or route through ``operators.relational.merge_upsert``.

Scale design: state is one row per group — the merge shuffles
|groups| + |delta groups| rows, never the fact table. ``refresh`` writes
state as a new dated snapshot via ``plans.layout`` (same layout/retention
machinery as the data snapshots), so the view is time-travelable and the
previous state stays readable until expired. The equivalence
``merge(partial(base), partial(delta)) == partial(base ∪ delta)`` is
oracle-checked end-to-end by ``workload.q_incremental_agg_state`` and
pinned per-call by the tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from statline_bq_spark.plans import layout

#: agg name -> (state builder, state merger). State columns are named
#: ``{out}`` directly so merged state IS the readable view for count/sum/
#: min/max; ``avg`` specs add derived columns at finalize time.
_MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


@dataclass(frozen=True)
class AggSpec:
    """One maintained aggregate: ``fn`` ∈ count|sum|min|max, over ``col``
    (ignored for count), surfaced as ``out``."""

    fn: str
    col: str | None
    out: str

    def __post_init__(self) -> None:
        if self.fn not in _MERGEABLE:
            raise ValueError(
                f"{self.fn!r} is not incrementally maintainable; "
                f"supported: {sorted(_MERGEABLE)} (avg derives at read "
                "time from sum+count; count_distinct needs HLL sketches)"
            )


def partial_state(df: DataFrame, keys: list[str], specs: list[AggSpec]) -> DataFrame:
    """Aggregate ``df`` into one state row per group (map-side partials
    before the exchange — Spark's hash-agg does the two-phase split)."""
    aggs = [
        _MERGEABLE[s.fn][0](F.col(s.col) if s.col else None).alias(s.out)
        for s in specs
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    states: list[DataFrame], keys: list[str], specs: list[AggSpec]
) -> DataFrame:
    """Fold state DataFrames into one: union (cheap, no shuffle) then one
    hash-agg with each aggregate's MERGE function (sum for count/sum, min
    for min, max for max)."""
    if not states:
        raise ValueError("need at least one state DataFrame")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    merges = [_MERGEABLE[s.fn][1](F.col(s.out)).alias(s.out) for s in specs]
    return unioned.groupBy(*keys).agg(*merges)


def with_avg(state: DataFrame, *, sum_col: str, count_col: str, out: str) -> DataFrame:
    """Derive an average at read time from maintained sum+count state."""
    return state.withColumn(out, F.col(sum_col) / F.col(count_col))


class IncrementalView:
    """A grouped view maintained as dated state snapshots on disk.

    ``refresh(delta)`` = read latest state (if any) → merge the delta's
    partials → write a NEW dated snapshot (never in place: the previous
    state remains readable for time travel / concurrent readers, and a
    failed refresh can't corrupt the view). ``read()`` returns the latest
    state. Storage/retention ride on ``plans.layout`` exactly like data
    snapshots.
    """

    def __init__(
        self,
        root: str,
        name: str,
        keys: list[str],
        specs: list[AggSpec],
        *,
        source: str = "views",
        odata_version: str = "v1",
    ) -> None:
        self.root = root
        self.name = name
        self.keys = list(keys)
        self.specs = list(specs)
        self.source = source
        self.odata_version = odata_version

    def _dates(self, spark: SparkSession) -> list[str]:
        return layout.list_snapshot_dates(
            self.root, self.source, self.odata_version, self.name
        )

    def refresh(
        self, spark: SparkSession, delta: DataFrame, *, load_date: str
    ) -> DataFrame:
        """Fold ``delta`` into the view; returns the new state.

        Same-date refresh (a retry of a failed load, or two loads in one
        day) would otherwise read the latest snapshot from the very path
        the overwrite targets — Spark refuses with "Cannot overwrite a
        path that is also being read from", and a partially-deleted target
        could corrupt the view. The merged state is therefore materialized
        (``localCheckpoint``) BEFORE the write whenever ``load_date``
        collides with the current latest date, cutting the read
        dependency. A ``load_date`` strictly older than the latest
        snapshot is rejected: it would silently never become the state
        ``read()`` returns (latest-wins layout).
        """
        dates = self._dates(spark)
        if dates and load_date < max(dates):
            raise ValueError(
                f"load_date {load_date!r} predates the latest state "
                f"snapshot {max(dates)!r}; refreshes must be monotone"
            )
        parts = [partial_state(delta, self.keys, self.specs)]
        if dates:
            parts.append(self.read(spark))
        state = merge_states(parts, self.keys, self.specs)
        if dates and load_date == max(dates):
            state = state.localCheckpoint(eager=True)
        layout.write_snapshot(
            state,
            self.root,
            self.source,
            self.odata_version,
            self.name,
            "state",
            load_date=load_date,
        )
        return state

    def read(self, spark: SparkSession) -> DataFrame:
        """Latest state snapshot."""
        return layout.read_latest_snapshot(
            spark, self.root, self.source, self.odata_version, self.name, "state"
        ).drop("load_date")
