#!/usr/bin/env python
"""Dump .explain('formatted') for named bench queries to files.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <suffix> <q> [q...]
Runs against the workload in <repo_root> (so a git worktree of an older
commit produces the 'before' dumps) at $SPARK_GRAFT_SF_DIR (default
sf0.1).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo)
    from statline_bq_spark.session import get_spark
    from statline_bq_spark.workload import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
