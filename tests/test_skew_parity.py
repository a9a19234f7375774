"""Skewed-key oracle sweep (opt-in: SPARK_GRAFT_SKEW=1).

The dirty sweep stresses VALUES; this one stresses KEY DISTRIBUTION —
the classic 100 TB failure mode the clean fixtures never exhibit: one
user holding ~50% of events (bot traffic / a default account), one
customer ~50% of orders, one order key ~50% of lineitems (a bulk
order). Every per-key operator — session windows, as-of joins, per-key
top-k, join fan-in/fan-out, window island scans — suddenly sees a
partition-dominating hot key.

What this can catch that value-dirt cannot:

- tie-breaking that was complete enough for ≤5 rows per key but not for
  thousands (rank/row_number picks, island-scan boundaries);
- per-key state that silently assumed "keys are small" (collect_list
  per user, interval self-pairing) — a quadratic blowup shows up as a
  timeout here before it shows up as an OOM on a cluster;
- oracle SQL whose correlated subqueries scale with key cardinality
  differently than the Spark formulation.

Like the dirty sweep this runs on TWO base SFs (tie-luck and filter
reach are base-data-dependent — round 7b lesson). Excluded from the
default run; the AQE/spill behavior of the hot-key plans at sf0.1 is
pinned separately in tests/test_bench_contract.py.
"""

from __future__ import annotations

import os
import sys

import pytest

from statline_bq_spark.workload import ORACLES

from tests.conftest import TESTDATA
from tests.test_dirty_parity import _check

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SKEW"),
    reason="skewed-key sweep is opt-in (SPARK_GRAFT_SKEW=1); "
    "clean sf0.01 runs in test_oracle_parity",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def skew_dir(tmp_path_factory):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dirty_sf import build_skewed

    out = str(tmp_path_factory.mktemp("skew_sf"))
    build_skewed(f"{TESTDATA}/sf0.001", out)
    return out


@pytest.fixture(scope="session")
def skew_dir_sf01(tmp_path_factory):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dirty_sf import build_skewed

    out = str(tmp_path_factory.mktemp("skew_sf01"))
    build_skewed(f"{TESTDATA}/sf0.01", out)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_on_skewed_keys(spark, skew_dir, name):
    _check(spark, skew_dir, name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_on_skewed_keys_sf01(
    spark, skew_dir_sf01, name
):
    """The same hot keys over the sf0.01 base: ~5k events on one user,
    ~30k lineitems on one order — large enough that a per-key quadratic
    or an incomplete tie-break actually bites."""
    _check(spark, skew_dir_sf01, name)
