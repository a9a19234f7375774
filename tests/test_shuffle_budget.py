"""Shuffle-budget regression net (default suite, round 10).

Shuffle write is the plan-quality signal host load can't corrupt: r8/r9
bench captures matched to the hundredth of a MB while wall time swung 60%.
But bench only runs at round end — a plan regression (broadcast join
degrading to sort-merge, a new exchange sneaking into a pipeline, a
pushed-down filter un-pushing) in an untimed change would stay invisible
for a whole round. This test runs every headline query at sf0.01 against
the pinned per-query budget in shuffle_manifest.json.

Measurement is scoped to the QUERY'S OWN stages via a Spark job group
(jobs REST API → stageIds → per-stage counters), not global
before/after deltas: the suite's shared session can complete unrelated
stages asynchronously (a prior module's streaming sink, a lingering
job), and a global delta pollutes small budgets — observed live when an
83-byte pin failed only in the full-suite context while the module
passed standalone.

On a regression: if the movement is INTENDED (a deliberate plan change),
regenerate with ``python tools/gen_shuffle_manifest.py`` and review the
diff like a lockfile; if not, the offending exchange is new — find it with
``.explain("formatted")`` before it ships.

Tolerance: ±25% relative with a 4 KiB absolute floor on shuffle bytes.
Compressed exchange sizes jitter slightly with row order; a genuinely
new exchange at sf0.01 moves a query by tens of KB to MB — well past
the band. Input bytes get a wider 64 KiB floor: parquet reads re-touch
footers and dictionary pages in row-group-order-dependent ways.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
import uuid

import pytest

from statline_bq_spark.workload import QUERIES

from tests.conftest import SF_ORACLE

_MANIFEST = os.path.join(os.path.dirname(__file__), "shuffle_manifest.json")

with open(_MANIFEST) as _f:
    _M = json.load(_f)
_PINNED: dict[str, int] = _M["shuffle_write_bytes"]
_PINNED_INPUT: dict[str, int] = _M.get("input_bytes", {})

ABS_FLOOR = 4096
REL_BAND = 0.25
INPUT_ABS_FLOOR = 65536


def _api(spark, path: str):
    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/{path}"
    )
    return json.load(urllib.request.urlopen(url, timeout=10))


def _grouped_query_bytes(spark, fn) -> tuple[int, int]:
    """(shuffle-write, input) bytes over exactly the stages of the jobs
    this call runs, identified by a unique job group."""
    sc = spark.sparkContext
    group = f"budget-{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(group, "shuffle-budget measurement")
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    # status-store updates are async: poll until the group's jobs are all
    # succeeded and their stages are all visible as complete
    stage_ids: set[int] = set()
    for _ in range(100):
        jobs = [j for j in _api(spark, "jobs") if j.get("jobGroup") == group]
        if jobs and all(j.get("status") == "SUCCEEDED" for j in jobs):
            stage_ids = {s for j in jobs for s in j.get("stageIds", [])}
            stages = _api(spark, "stages?status=complete")
            seen = {s["stageId"] for s in stages}
            # skipped stages (reused exchanges) never complete; require
            # only that no PENDING members of the group's jobs remain
            active = {s["stageId"] for s in _api(spark, "stages?status=active")}
            if not (stage_ids & active):
                shuffle = sum(
                    s.get("shuffleWriteBytes", 0)
                    for s in stages
                    if s["stageId"] in stage_ids
                )
                inp = sum(
                    s.get("inputBytes", 0)
                    for s in stages
                    if s["stageId"] in stage_ids
                )
                _ = seen  # (kept for debuggability)
                return shuffle, inp
        time.sleep(0.05)
    raise TimeoutError(f"job group {group} never settled in the status store")


@pytest.fixture(scope="module")
def budget_spark(spark):
    if spark.sparkContext.uiWebUrl is None:
        pytest.skip("UI disabled; shuffle counters unavailable")
    try:
        _api(spark, "jobs?status=succeeded")
    except Exception:
        pytest.skip("UI REST API unreachable; shuffle counters unavailable")
    return spark


@pytest.mark.parametrize("name", sorted(_PINNED))
def test_query_shuffle_within_budget(budget_spark, name):
    got, got_in = _grouped_query_bytes(
        budget_spark, lambda: QUERIES[name](budget_spark, SF_ORACLE).count()
    )
    pinned = _PINNED[name]
    band = max(ABS_FLOOR, int(pinned * REL_BAND))
    assert abs(got - pinned) <= band, (
        f"{name}: shuffle write {got} bytes vs pinned {pinned} "
        f"(band ±{band}) — a plan changed; explain('formatted') the query "
        "and either fix the exchange or regenerate the manifest "
        "(tools/gen_shuffle_manifest.py) if intended"
    )
    if name in _PINNED_INPUT:
        pinned_in = _PINNED_INPUT[name]
        band_in = max(INPUT_ABS_FLOOR, int(pinned_in * REL_BAND))
        assert abs(got_in - pinned_in) <= band_in, (
            f"{name}: input {got_in} bytes vs pinned {pinned_in} "
            f"(band ±{band_in}) — the SCAN widened (dropped column prune "
            "or un-pushed filter); check ReadSchema/PushedFilters in "
            "explain('formatted'), or regenerate the manifest if intended"
        )


def test_manifest_covers_all_headliners():
    """The manifest and bench's headline list must not drift apart —
    a new headliner without a budget is an unwatched query."""
    from bench import BENCH_QUERIES

    assert set(_PINNED) == set(BENCH_QUERIES)
