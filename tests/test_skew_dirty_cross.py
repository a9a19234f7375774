"""Skew × dirty CROSS sweep (opt-in: SPARK_GRAFT_SKEW_DIRTY=1).

Dirty rows appended onto a SKEWED base — probe-class interactions the
individual sweeps can't reach, because each class changes the data
geometry the other's rows land in. The first run of this cross (round
8) found a real one within minutes: the content-skewed embedding base
changed which vector the dirty builder's duplicated corpus vec_id
carries, exposing that the `semantic_decontaminated` oracle killed
contaminated ids at ID level (`DISTINCT vec_id` + `NOT IN`) while the
engine's left-anti is per ROW — a duplicated id with one clean and one
contaminated encoding kept the clean row in Spark and lost it in the
oracle (and the `NOT IN` was one NULL id away from three-valued-logic
poisoning the whole membership test).

One composed fixture (sf0.001 → build_skewed → build); the full oracle
registry swept on it. Excluded from the default run like the other
sweep modules.
"""

from __future__ import annotations

import os
import sys

import pytest

from statline_bq_spark.workload import ORACLES

from tests.conftest import TESTDATA
from tests.test_dirty_parity import _check

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SKEW_DIRTY"),
    reason="skew×dirty cross sweep is opt-in (SPARK_GRAFT_SKEW_DIRTY=1)",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def cross_dir(tmp_path_factory):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dirty_sf import build, build_skewed

    skewed = str(tmp_path_factory.mktemp("skew_base"))
    build_skewed(f"{TESTDATA}/sf0.001", skewed)
    out = str(tmp_path_factory.mktemp("skew_dirty"))
    build(skewed, out)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_on_skew_dirty_cross(spark, cross_dir, name):
    _check(spark, cross_dir, name)
