#!/usr/bin/env python
"""Round-11 plan snapshots: dump .explain('formatted') for the bench
headliners (or any named queries) into plans/r11/<query>_<tag>.txt.

Usage: python tools/r11_plans.py <before|after> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from statline_bq_spark.session import get_spark  # noqa: E402
from statline_bq_spark.workload import QUERIES  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        plan = QUERIES[name](spark, sf)._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
