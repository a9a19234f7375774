#!/usr/bin/env python
"""Emulate the driver's bounded correctness gate locally: run the FIRST N
(default 50) entries of `__spark_entry__.queries()` on a VANILLA
SparkSession and compare rows/columns/values against `oracle_sql()` on
DuckDB at sf0.01 — the same shape as the per-round CORRECTNESS_r{N}.json.

Usage: python tools/check_window.py [N]

Exit code 0 iff every checked entry matches. This is the pre-round smoke
that catches (a) queries relying on engine-session confs the driver won't
set, (b) oracle typing artifacts (HUGEINT sums), (c) window-ordering
mistakes in __spark_entry__ — before the driver does.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def row_key(row):
    """Null-safe total order (NULLs last, stringified values)."""
    return tuple((v is None, str(v)) for v in row)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-window-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, oracles = mod.queries(), mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t)}.parquet')"
        )

    failures = []
    for name in list(qs)[:n]:
        try:
            sdf = qs[name](spark, SF)
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(canon(r[c]) for c in scols) for r in sdf.collect()),
                key=row_key,
            )
            if name not in oracles:
                print(f"{name}: rows-only ({len(srows)} rows)")
                continue
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            idx = [dcols.index(c) for c in sorted(dcols)]
            drows = sorted(
                (tuple(canon(r[i]) for i in idx) for r in cur.fetchall()),
                key=row_key,
            )
            if scols != sorted(dcols):
                failures.append((name, f"cols {scols} vs {sorted(dcols)}"))
            elif len(srows) != len(drows):
                failures.append(
                    (name, f"rowcount {len(srows)} vs {len(drows)}")
                )
            elif srows != drows:
                bad = next(
                    (a, b) for a, b in zip(srows, drows) if a != b
                )
                failures.append((name, f"values {bad}"))
            else:
                print(f"{name}: OK ({len(srows)} rows)")
        except Exception as exc:  # noqa: BLE001 - report, don't die
            failures.append((name, f"ERROR {exc}"))

    print()
    if failures:
        for name, why in failures:
            print(f"FAIL {name}: {why}")
        return 1
    print(f"window of {n}: all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
