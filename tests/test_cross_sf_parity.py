"""Cross-scale-factor oracle sweep (opt-in: SPARK_GRAFT_CROSS_SF=1).

The standard parity suite runs at sf0.01 — the driver's gate. This sweep
re-runs every oracle-checked query at sf0.001 and sf0.1 as well: a query
that only matches at one scale factor is matching by luck (float rounding
ties, interpolation boundaries, -0.0), not by construction. Round 1 found
three such latent divergences this way (percentile interpolation ties,
avg ulp ordering, negative zero) — keep running it when touching any
float-producing query.

~8 min; excluded from the default run so the driver's `pytest tests/ -x -q`
stays fast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from statline_bq_spark.io import TABLES, table_path
from statline_bq_spark.workload import ORACLES, QUERIES

from tests.conftest import TESTDATA
from tests.test_oracle_parity import _normalize

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_CROSS_SF"),
    reason="cross-SF sweep is opt-in (SPARK_GRAFT_CROSS_SF=1); sf0.01 runs in test_oracle_parity",
)

SWEEP_SFS = (f"{TESTDATA}/sf0.001", f"{TESTDATA}/sf0.1")


@pytest.mark.parametrize("sf_dir", SWEEP_SFS, ids=["sf0.001", "sf0.1"])
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_at_sf(spark, sf_dir, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    sdf = QUERIES[name](spark, sf_dir)
    s_cols, s_rows = _normalize(sdf.columns, sdf.collect())
    res = con.execute(ORACLES[name])
    d_cols, d_rows = _normalize(
        [d[0] for d in res.description], res.fetchall()
    )
    assert s_cols == d_cols
    assert len(s_rows) == len(d_rows)
    assert s_rows == d_rows
    con.close()
