#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Timing = full query wall time including the action (count on the result),
after one warm-up run of the flagship query so JVM/codegen startup isn't
billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from statline_bq_spark.session import get_spark  # noqa: E402
from statline_bq_spark.workload import QUERIES  # noqa: E402

#: Headline subset: the flagship star query plus one representative per
#: operator family (agg, window, pivot, sessionization, dedup, similarity,
#: text). Full coverage runs in tests; bench tracks throughput.
BENCH_QUERIES = (
    "star_schema_agg",
    "pricing_summary",
    "filtered_slice",
    "top_orders_per_customer",
    "latest_event_per_user",
    "pivot_event_values",
    "unpivot_lineitem",
    "session_windows",
    "tumbling_hourly_stats",
    "sliding_6h_stats",
    "running_order_totals",
    "asof_click_before_purchase",
    "cube_order_stats",
    "price_percentiles",
    "dedup_exact_docs",
    "minhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "simhash_neardup_pairs",
    "ann_cosine_topk",
    "ivf_ann_topk",
    "embedding_centroids",
    "token_stats",
    "quality_scores",
    "multimodal_binary_meta",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("statline-bq-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM, codegen, parquet footer caches.
    QUERIES["star_schema_agg"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
