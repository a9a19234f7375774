"""sf1.0 scaling-slope regression net (opt-in: SPARK_GRAFT_SF1=1).

The round-8 sf1.0 capture (STRESS.md) is the repo's only superlinearity
evidence above sf0.1 — a one-shot table that nothing re-checks. This
module enforces its tail: regenerate the 10× replica data via
``tools/gen_sf1.py`` (FK-consistent key offsets; 6M lineitem, 500k
docs), time the five heaviest-slope queries at sf0.1 and sf1.0, and
assert each stays within an 8× wall slope on 10× data with ZERO spill.
A slope ≤10× is at-or-better-than linear in rows; 8× leaves headroom
below that while still catching the failure mode this net exists for —
an uncapped candidate generator or a broadcast that silently flipped to
a shuffle, which shows up as 20–100×, not 1.2×.

Timing is min-of-2 per (query, SF) after a warm run, and the PASS bound
is deliberately loose (the host swings ±60% run-to-run; a real
superlinearity blowup clears 8× by an order of magnitude).

MUST RUN STANDALONE (`pytest tests/test_sf1_regression.py`): spill
counters come from the UI REST API, and `spark.ui.enabled` is a
launch-time conf the shared conftest session has off. ~6 min + ~1 min
data build (~200 MB in tmp).
"""

from __future__ import annotations

import os
import sys
import time

import pytest

from statline_bq_spark.session import get_spark
from statline_bq_spark.workload import QUERIES

from tests.conftest import TESTDATA

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF1"),
    reason="sf1.0 slope net is opt-in (SPARK_GRAFT_SF1=1) and must run "
    "standalone (needs a UI-enabled session for spill counters)",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The five heaviest 10×-data slopes from the round-8 capture
#: (STRESS.md: 5.4×, 4.7×, 3.7×, 3.5×, 3.5×) — the queries where a
#: regression toward superlinear candidate growth would surface first.
HEAVY_QUERIES = (
    "semantic_decontaminated",
    "gopher_quality_funnel",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "passage_dup_docs",
)

MAX_SLOPE = 8.0


@pytest.fixture(scope="session")
def sf1_spark():
    s = get_spark("sf1-slope-net", extra_conf={"spark.ui.enabled": "true"})
    if s.sparkContext.uiWebUrl is None:
        pytest.skip(
            "an existing UI-less session is active; run this module "
            "standalone"
        )
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.fixture(scope="session")
def sf1_dir(tmp_path_factory):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from gen_sf1 import build

    out = str(tmp_path_factory.mktemp("sf1"))
    build(f"{TESTDATA}/sf0.1", out, 10)
    return out


def _spilled_bytes(spark) -> int:
    import json
    import urllib.request

    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages?status=complete"
    )
    stages = json.load(urllib.request.urlopen(url, timeout=10))
    return sum(
        s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
        for s in stages
    )


def _min_of_2(fn, spark, sf_dir) -> float:
    fn(spark, sf_dir).count()  # warm: codegen compile, footer caches
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
    return min(runs)


@pytest.mark.parametrize("name", HEAVY_QUERIES)
def test_heavy_query_slope_stays_sublinear_at_sf1(sf1_spark, sf1_dir, name):
    fn = QUERIES[name]
    base = _min_of_2(fn, sf1_spark, f"{TESTDATA}/sf0.1")
    big = _min_of_2(fn, sf1_spark, sf1_dir)
    slope = big / max(base, 1e-6)
    assert slope <= MAX_SLOPE, (
        f"{name}: sf0.1 {base:.2f}s -> sf1.0 {big:.2f}s = {slope:.1f}x "
        f"on 10x data (bound {MAX_SLOPE}x) — superlinear candidate "
        "growth or a broadcast->shuffle flip"
    )
    assert _spilled_bytes(sf1_spark) == 0, f"{name}: spill at sf1.0"
