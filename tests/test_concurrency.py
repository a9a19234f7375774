"""Concurrent-execution invariance (default-on, fast).

A shared SparkSession serves concurrent queries in real deployments
(notebooks, job servers, the driver's own t2 harness if it ever
parallelizes). Session state is process-global — `read_table` sets
session confs, every query shares one Catalyst/conf namespace — so a
query that worked serially can diverge under concurrency if any of that
state is load-bearing per query. This pins a representative mix (scan,
star join, window, dedup, text, events/nanos path) running 4-way
concurrent against their serial results.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from statline_bq_spark.workload import QUERIES

from tests.conftest import SF_ORACLE

QUERY_MIX = (
    "pricing_summary",
    "star_schema_agg",
    "top_orders_per_customer",
    "session_windows",      # events scan: the nanos-conf path
    "dedup_exact_docs",
    "token_stats",
    "latest_event_per_user",
    "quality_scores",
)


def _rows(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_concurrent_queries_match_serial_results(spark):
    serial = {n: _rows(spark, n) for n in QUERY_MIX}
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = {n: pool.submit(_rows, spark, n) for n in QUERY_MIX}
        concurrent = {n: f.result(timeout=600) for n, f in futs.items()}
    for n in QUERY_MIX:
        assert concurrent[n] == serial[n], f"{n} diverged under concurrency"
