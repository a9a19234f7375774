"""Shuffle-budget regression net (default suite, round 10).

Shuffle write is the plan-quality signal host load can't corrupt: r8/r9
bench captures matched to the hundredth of a MB while wall time swung 60%.
But bench only runs at round end — a plan regression (broadcast join
degrading to sort-merge, a new exchange sneaking into a pipeline, a
pushed-down filter un-pushing) in an untimed change would stay invisible
for a whole round. This test runs every headline query at sf0.01 against
the pinned per-query budget in shuffle_manifest.json.

On a regression: if the movement is INTENDED (a deliberate plan change),
regenerate with ``python tools/gen_shuffle_manifest.py`` and review the
diff like a lockfile; if not, the offending exchange is new — find it with
``.explain("formatted")`` before it ships.

Tolerance: ±25% relative with a 4 KiB absolute floor. Compressed exchange
sizes jitter slightly with row order; a genuinely new exchange at sf0.01
moves a query by tens of KB to MB — well past the band. Queries pinned at
~59 bytes (single-partition final count aggs) get the floor.
"""

from __future__ import annotations

import json
import os
import time

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
#: Input bytes get a wider floor: parquet reads re-touch footers and
#: dictionary pages in row-group-order-dependent ways, so small scans
#: jitter by a few KB where shuffle writes are byte-stable.
INPUT_ABS_FLOOR = 65536


def _totals(spark) -> tuple[int, int] | None:
    """Cumulative (shuffle-write, input) bytes over completed stages (UI
    REST API, same counters bench.py records). None when unreachable."""
    import urllib.request

    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages?status=complete"
    )
    try:
        stages = json.load(urllib.request.urlopen(url, timeout=10))
    except Exception:
        return None
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("inputBytes", 0) for s in stages),
    )


def _settled_totals(spark) -> tuple[int, int] | None:
    """Poll until two consecutive reads agree — the status store updates
    asynchronously after the action returns."""
    prev = _totals(spark)
    if prev is None:
        return None
    for _ in range(20):
        time.sleep(0.05)
        cur = _totals(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


@pytest.fixture(scope="module")
def budget_spark(spark):
    if spark.sparkContext.uiWebUrl is None or _totals(spark) is None:
        pytest.skip("UI REST API unreachable; shuffle counters unavailable")
    return spark


@pytest.mark.parametrize("name", sorted(_PINNED))
def test_query_shuffle_within_budget(budget_spark, name):
    before = _settled_totals(budget_spark)
    QUERIES[name](budget_spark, SF_ORACLE).count()
    after = _settled_totals(budget_spark)
    got = after[0] - before[0]
    pinned = _PINNED[name]
    band = max(ABS_FLOOR, int(pinned * REL_BAND))
    assert abs(got - pinned) <= band, (
        f"{name}: shuffle write {got} bytes vs pinned {pinned} "
        f"(band ±{band}) — a plan changed; explain('formatted') the query "
        "and either fix the exchange or regenerate the manifest "
        "(tools/gen_shuffle_manifest.py) if intended"
    )
    if name in _PINNED_INPUT:
        got_in = after[1] - before[1]
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
