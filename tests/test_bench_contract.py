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


def test_rows_only_queries_stay_out_of_the_oracle_dict():
    """The three *_raw bench twins are rows-only on purpose; everything
    else in the bench set must be oracle-backed."""
    for n in bench.BENCH_QUERIES:
        if n.endswith("_raw"):
            assert n not in ORACLES
        else:
            assert n in ORACLES, f"{n} lost its oracle"
