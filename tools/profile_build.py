#!/usr/bin/env python
"""Per-query build-vs-execute profile (guide §1, round 12).

For each bench query: time CONSTRUCTION (``QUERIES[name](spark, sf_dir)``,
pure driver-side py4j/Catalyst work plus any embedded collect jobs) and
EXECUTION (noop write of the built DataFrame) separately, min-of-N each.
The split directs the round-12 effort: the driver floor (~0.1-0.3 s of
Column-call chatter per expression-heavy builder) is invisible in the
bench totals but paid by every run.

Usage: python tools/profile_build.py [query ...]   (default: all bench)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from statline_bq_spark.session import get_spark  # noqa: E402
from statline_bq_spark.workload import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(BENCH_QUERIES)
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    spark = get_spark("profile-build")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: one full pass so JIT/codegen caches are steady
    for n in names:
        QUERIES[n](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    print(f"{'query':32s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    tb = te = 0.0
    for n in names:
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[n](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b, e = min(builds), min(execs)
        tb += b
        te += e
        print(f"{n:32s} {b:7.3f} {e:7.3f} {b + e:7.3f}")
    print(f"{'TOTAL (min-of-%d)' % reps:32s} {tb:7.3f} {te:7.3f} {tb + te:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
