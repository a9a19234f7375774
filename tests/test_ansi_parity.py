"""ANSI-mode invariance sweep (opt-in: SPARK_GRAFT_ANSI=1).

``spark.sql.ansi.enabled`` flipped to TRUE by default in Spark 4.0, so
every sweep this repo has ever run — clean, dirty, skew, cross, retry —
already executed under ANSI semantics (verified: the vanilla pyspark
4.1.2 session reports ``true``). The UNTESTED direction is therefore
ANSI **OFF**: the legacy mode every Spark 3.x cluster runs, where the
behaviors ANSI turns into errors instead silently produce values —
int64 overflow wraps, bad casts return NULL, array index past the end
returns NULL, ``element_at(map, missing)`` returns NULL. A query
leaning on an ANSI-only error OR an ANSI-only value (e.g. a try_cast
that legacy mode resolves differently) would pass every existing sweep
and silently return different rows on a 3.x cluster.

This module runs the FULL oracle registry with ANSI forced OFF over the
dirty fixture (int64-edge keys, ±Inf/NaN measures, malformed JSON,
NULL PKs — the rows where lenient semantics actually bite) on both base
SFs, with the same rows+schema+values DuckDB comparison as the dirty
sweep. Green = the engine's results are ANSI-mode-invariant: it never
relies on either mode's cast/overflow edge behavior.

Runs fine under the shared session (ANSI is a runtime conf, restored
after each check). ~25 min; opt-in like the other sweep families.
"""

from __future__ import annotations

import os
import sys

import pytest

from statline_bq_spark.workload import ORACLES

from tests.conftest import TESTDATA
from tests.test_dirty_parity import _check

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_ANSI"),
    reason="ANSI-mode sweep is opt-in (SPARK_GRAFT_ANSI=1); "
    "the ANSI-on dirty sweep is tests/test_dirty_parity.py",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def dirty_dir(tmp_path_factory):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dirty_sf import build

    out = str(tmp_path_factory.mktemp("ansi_dirty_sf"))
    build(f"{TESTDATA}/sf0.001", out)
    return out


@pytest.fixture(scope="session")
def dirty_dir_sf01(tmp_path_factory):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dirty_sf import build

    out = str(tmp_path_factory.mktemp("ansi_dirty_sf01"))
    build(f"{TESTDATA}/sf0.01", out)
    return out


def _check_legacy(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        _check(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_vanilla_session_is_ansi_on(spark):
    """Premise guard: if this ever reads false, the default flipped and
    the sweep direction below must be re-examined."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_with_ansi_off_on_dirty_data(
    spark, dirty_dir, name
):
    _check_legacy(spark, dirty_dir, name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_with_ansi_off_on_dirty_data_sf01(
    spark, dirty_dir_sf01, name
):
    _check_legacy(spark, dirty_dir_sf01, name)
