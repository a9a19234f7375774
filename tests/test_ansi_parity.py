"""ANSI-mode parity sweep (opt-in: SPARK_GRAFT_ANSI=1).

Spark 4.0 flipped ``spark.sql.ansi.enabled`` to TRUE by default: silent
overflow/bad-cast/array-index behaviors become runtime ERRORS. The
driver runs a vanilla session, so the engine already executes under
whatever default the installed Spark ships — but the engine must hold
under BOTH settings, and the dangerous direction is ANSI ON over dirty
data: a query that silently wrapped an int64 overflow or cast a
non-numeric string to 0 under legacy mode instead kills the job.

Round 7 hardened five ANSI job-killers found ad hoc (CAST(NaN/Inf AS
BIGINT), DIVIDE_BY_ZERO on degenerate groups, decimal overflow in
wide sums, int64-min negation, from_xml int64-min); this module finishes
the program: the FULL oracle registry, ANSI forced ON, over the dirty
fixture (which carries the int64-edge keys, ±Inf/NaN measures, malformed
JSON and NULL-PK rows) on both base SFs — the same rows+schema+values
DuckDB comparison as the dirty sweep, so an ANSI crash OR an ANSI-mode
value divergence both fail.

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
    "the default-mode dirty sweep is tests/test_dirty_parity.py",
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


def _check_ansi(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        _check(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_under_ansi_on_dirty_data(
    spark, dirty_dir, name
):
    _check_ansi(spark, dirty_dir, name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_under_ansi_on_dirty_data_sf01(
    spark, dirty_dir_sf01, name
):
    _check_ansi(spark, dirty_dir_sf01, name)
