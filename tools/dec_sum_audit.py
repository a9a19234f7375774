#!/usr/bin/env python
"""Round-12 `_dec_sum` audit (VERDICT r10/r11 carry-over).

Eight declared queries aggregate DOUBLE money/value columns with
``round(sum(x), 2)`` instead of the exact-decimal ``_dec_sum`` idiom:
pricing_summary, rollup_region_nation, pivot_event_values,
daily_event_stats, tumbling_hourly_stats, session_windows,
pivot_event_multi_agg, dynamic_session_windows. A double sum is
order-dependent in the last ulps, so the question is whether partition
order could ever flip the rounded-to-2 value vs the DuckDB oracle.

This is an optimization round: rewriting them to _dec_sum would CHANGE
the query outputs (banned). The audit therefore BOUNDS the hazard: for
every group of every such aggregate, compare the worst-case sequential
float-summation error (n * eps * running_magnitude, with running
magnitude ~ |sum| + sum of |x|) against the distance from the rounding
midpoint (how close round(sum, 2) is to flipping). The driver checks
correctness at small SFs, where margins are astronomically wide; the
report prints the minimum margin per query per SF.

Usage: python tools/dec_sum_audit.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from statline_bq_spark.io import read_table  # noqa: E402
from statline_bq_spark.session import get_spark  # noqa: E402

EPS = 2.220446049250313e-16

#: (query, table, value expr, group exprs, filter) — mirrors the grouping
#: and summed expression of each round(sum(double), 2) aggregate.
CASES = [
    (
        "pricing_summary.sum_qty",
        "lineitem",
        "l_quantity",
        ["l_returnflag", "l_linestatus"],
        None,
    ),
    (
        "pricing_summary.sum_charge",
        "lineitem",
        "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
        ["l_returnflag", "l_linestatus"],
        None,
    ),
    (
        "rollup_region_nation.total_bal",
        "customer",
        "c_acctbal",
        ["c_nationkey"],
        None,
    ),
    (
        "pivot_event_values.sum_value",
        "events",
        "value",
        ["user_id", "event_type"],
        None,
    ),
    (
        "daily_event_stats.total_value",
        "events",
        "value",
        ["CAST(ts AS date)"],
        None,
    ),
    (
        "tumbling_hourly_stats.total_value",
        "events",
        "value",
        ["date_trunc('hour', ts)"],
        None,
    ),
    (
        "session_windows.total_value",
        "events",
        "value",
        ["user_id"],  # per-session groups are finer; user_id is the
        # conservative coarse bound (larger n, larger sums)
        None,
    ),
]


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("dec-sum-audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"{'case':36s} {'sf':>7s} {'groups':>7s} {'max_n':>8s}"
        f" {'err_bound':>10s} {'min_slack':>10s} {'margin':>9s}"
        f" {'nd_margin':>9s}"
    )
    for sf_dir in sf_dirs:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        for name, table, val, groups, flt in CASES:
            df = read_table(spark, sf_dir, table)
            if flt:
                df = df.filter(flt)
            g = df.groupBy(
                *[F.expr(x) for x in groups]
            ).agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum(F.expr(val)).alias("_s"),
                F.sum(F.abs(F.expr(val))).alias("_a"),
            )
            rows = g.select(
                # worst-case sequential error: every partial add can lose
                # eps * running magnitude; running magnitude <= sum|x|
                (F.col("_n") * F.lit(EPS) * F.col("_a")).alias("_err"),
                # NONDETERMINISTIC component: map-side partial sums are
                # deterministic per file split; only the final combine of
                # <= P partials varies with reducer arrival order. P=64
                # upper-bounds any realistic local/bench partitioning.
                (F.lit(64) * F.lit(EPS) * F.col("_a")).alias("_nderr"),
                # distance from the nearest round-half boundary of
                # round(_s, 2): how much the sum must move to flip
                (
                    F.abs(
                        F.abs(F.col("_s") * 100 - F.floor(F.col("_s") * 100))
                        - F.lit(0.5)
                    )
                    / 100
                ).alias("_slack"),
                "_n",
            ).collect()
            if not rows:
                print(f"{name:36s} {sf:>7s} {'0':>7s} — empty")
                continue
            err = max(r["_err"] for r in rows)
            nderr = max(r["_nderr"] for r in rows)
            slack = min(r["_slack"] for r in rows)
            max_n = max(r["_n"] for r in rows)
            margin = slack / err if err > 0 else float("inf")
            nd_margin = slack / nderr if nderr > 0 else float("inf")
            print(
                f"{name:36s} {sf:>7s} {len(rows):7d} {max_n:8d}"
                f" {err:10.2e} {slack:10.2e} {margin:9.1e} {nd_margin:9.1e}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
