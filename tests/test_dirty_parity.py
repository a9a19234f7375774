"""Adversarial dirty-data oracle sweep (opt-in: SPARK_GRAFT_DIRTY=1).

The standard parity suite runs on the driver's clean testdata, which
contains none of the dirt real corpora carry — NULL text (failed
fetches), empty/whitespace docs, NULL embeddings (failed encoder calls),
zero-norm vectors, NULL labels/sources/langs. A query/oracle pair can
agree on clean data "by luck" while its semantics silently diverge on
the dirty rows (the round-3 ADVICE found one such case; the first run of
this sweep found SIXTEEN more, including two outright crashes).

This sweep re-runs every oracle-checked query against a dirty copy of
sf0.001 built by ``tools/dirty_sf.py`` (every table family gets dirty
rows: documents, embeddings, events, orders, lineitem, customer,
supplier, part, and nation — NULL keys, dangling FKs, NaN/±Inf
measures, malformed JSON, unicode edge cases). Divergence
classes it has caught: ANSI DIVIDE_BY_ZERO on degenerate groups, NULL
ordering (Spark NULLS FIRST vs DuckDB NULLS LAST) shifting rank picks,
NULL-group equi-join-backs dropping rows, concat_ws flattening all-NULL
arrays to '', greatest(NULL, 1) fabricating phantom chunks, NOT IN
poisoned by a NULL in the probe set, and the non-finite-measure family
(floor(NaN) is 0 in Spark, CAST(NaN/Inf AS BIGINT) throws, ANSI decimal
casts NULL non-finites while DuckDB crashes or sums Inf through, DuckDB
percentile_* skip NaN while Spark sorts it greatest — 9 NaN + 31 Inf
divergences found and fixed in round 5).

~12 min; excluded from the default run like the cross-SF sweep.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

from statline_bq_spark.io import TABLES, table_path
from statline_bq_spark.workload import ORACLES, QUERIES

from tests.conftest import TESTDATA
from tests.test_oracle_parity import _normalize

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_DIRTY"),
    reason="dirty-data sweep is opt-in (SPARK_GRAFT_DIRTY=1); "
    "clean sf0.01 runs in test_oracle_parity",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def dirty_dir(tmp_path_factory):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dirty_sf import build

    out = str(tmp_path_factory.mktemp("dirty_sf"))
    build(f"{TESTDATA}/sf0.001", out)
    return out


@pytest.fixture(scope="session")
def dirty_dir_sf01(tmp_path_factory):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dirty_sf import build

    out = str(tmp_path_factory.mktemp("dirty_sf01"))
    build(f"{TESTDATA}/sf0.01", out)
    return out


def _check(spark, sf_dir, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_on_dirty_data(spark, dirty_dir, name):
    _check(spark, dirty_dir, name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_on_dirty_data_sf01(
    spark, dirty_dir_sf01, name
):
    """The SAME dirty rows over the sf0.01 base: tie-luck and
    filter-reach are base-data-dependent — this variant's first run
    (round 7b) caught both session oracles' island scans ordering by ts
    alone (the dynamic one merged a 347-year-separated click into the
    1677 session; the static one was passing by sort luck on the
    sf0.001 geometry)."""
    _check(spark, dirty_dir_sf01, name)


_TZ_SENSITIVE = [
    n for n in sorted(ORACLES)
    if any(k in n for k in (
        "session", "tumbling", "sliding", "gap", "daily", "asof",
        "purchase", "timeline", "state_history", "transition", "busy",
        "latest_event", "retention", "hourly", "running", "interval",
        "epoch", "snapshot",
    ))
]


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_time_queries_hold_under_amsterdam_session_tz(
    spark, dirty_dir, name
):
    """The driver runs a VANILLA session — whatever timezone the host
    carries. Every timestamp column is NTZ and no query emits a raw
    timestamp, so results must be session-TZ-invariant; this pins the
    time-sensitive family against the oracle with the session forced to
    Europe/Amsterdam (CBS's home zone, with the round-8 DST-instant
    dirty rows in the fixture). First run: 33/33 no-divergence."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Europe/Amsterdam")
    try:
        _check(spark, dirty_dir, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


_ORDER_SENSITIVE = [
    n for n in sorted(ORACLES)
    if any(k in n for k in (
        "epoch_shuffle", "packed", "reservoir", "rank", "topk", "top_",
        "ngram", "minhash", "simhash", "winnow", "dedup", "session_paths",
        "timeline", "quantization", "kmeans", "ivf", "split", "sample",
        "neardup", "latest",
    ))
]


@pytest.mark.parametrize("name", _ORDER_SENSITIVE)
def test_order_sensitive_queries_hold_under_hostile_partitioning(
    spark, dirty_dir, name
):
    """Partition-count invariance (round 8): a 1000-executor cluster
    partitions nothing like local[32], so no result may depend on the
    partitioning — the classic leaks are monotonically_increasing_id
    ordering, per-partition first/limit picks, and float fold order.
    Pins the order-sensitive family against the oracle with 7 shuffle
    partitions, 64 KB scan splits, and AQE off. The full-registry probe
    ran 230/230 green first (round-8 one-shot)."""
    confs = {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.maxPartitionBytes": "65536",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        _check(spark, dirty_dir, name)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


_ARROW_UDF_FAMILY = [
    n for n in sorted(ORACLES)
    if any(k in n for k in (
        "ann_", "arrow", "kmeans", "ivf", "multimodal", "udaf", "udtf",
        "chunk", "quantized", "rerank",
    ))
]


@pytest.mark.parametrize("name", _ARROW_UDF_FAMILY)
def test_udf_paths_hold_under_tiny_arrow_batches(spark, dirty_dir, name):
    """Arrow batch-size invariance (round 8): 7-row batches make every
    mapInPandas / mapInArrow / UDTF path see many batches per partition
    — anything assuming one batch per partition, or mishandling
    per-batch top-k/pruning state, diverges here. Full-registry probe
    ran 230/230 green first."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        _check(spark, dirty_dir, name)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
