#!/usr/bin/env python
"""Regenerate tests/shuffle_manifest.json — the pinned per-query
shuffle-write budget at sf0.01.

Shuffle bytes are the round-over-round signal this host's wall-time noise
cannot corrupt (r8/r9 bench captures matched to the hundredth of a MB), but
until round 10 they were only recorded in bench artifacts at sf0.1 — a plan
regression in an untimed query (a broadcast join silently degrading to
sort-merge, a new exchange sneaking into a pipeline) would stay invisible
until the round-end bench. The manifest pins every headline query's shuffle
footprint at the oracle scale factor; tests/test_shuffle_budget.py asserts
against it in the DEFAULT suite.

Run after any deliberate plan change, then review the diff like a lockfile:

    python tools/gen_shuffle_manifest.py          # writes tests/shuffle_manifest.json
    git diff tests/shuffle_manifest.json          # every movement is a decision
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import BENCH_QUERIES, StageMetrics  # noqa: E402
from statline_bq_spark.session import get_spark  # noqa: E402
from statline_bq_spark.workload import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_MANIFEST_SF", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(
        "shuffle-manifest", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    metrics = StageMetrics(spark)
    shuffle: dict[str, int] = {}
    scan: dict[str, int] = {}
    before = metrics.totals()
    assert before, "UI REST API unreachable — cannot measure shuffle"
    for name in BENCH_QUERIES:
        QUERIES[name](spark, SF_DIR).count()
        after = metrics.totals()
        shuffle[name] = after["shuffle_write"] - before["shuffle_write"]
        # input bytes pin SCAN width: a dropped column prune / un-pushed
        # filter widens the parquet read without touching shuffle
        scan[name] = after["input"] - before["input"]
        before = after
    path = os.path.join(_REPO, "tests", "shuffle_manifest.json")
    with open(path, "w") as f:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "shuffle_write_bytes": shuffle,
                "input_bytes": scan,
            },
            f, indent=1, sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {path} ({len(shuffle)} queries)")


if __name__ == "__main__":
    main()
