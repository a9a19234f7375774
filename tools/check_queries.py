#!/usr/bin/env python
"""Oracle-check specific queries by name (the per-batch development loop).

`tools/check_window.py` emulates the driver's bounded 50-entry gate;
this tool checks an explicit list instead — the tight loop when adding
or editing individual queries:

    python tools/check_queries.py epoch_shuffle_order table_checksums

Runs each named `workload.QUERIES` entry on a vanilla local session and
its `workload.ORACLES` SQL on DuckDB over the same parquet
($SPARK_GRAFT_ORACLE_SF, default sf0.01), comparing column names, row
count, and order-insensitive canonicalized values — the driver's exact
comparison shape. Exit 0 iff all named queries match.
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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
    return tuple((v is None, str(v)) for v in row)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    import duckdb
    from pyspark.sql import SparkSession

    from statline_bq_spark.workload import ORACLES, QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t)}.parquet')"
        )

    failures = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, SF)
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(canon(r[c]) for c in scols) for r in sdf.collect()),
                key=row_key,
            )
            if name not in ORACLES:
                print(f"{name}: rows-only ({len(srows)} rows)")
                continue
            cur = con.execute(ORACLES[name])
            dcols = [d[0] for d in cur.description]
            idx = [dcols.index(c) for c in sorted(dcols)]
            drows = sorted(
                (tuple(canon(r[i]) for i in idx) for r in cur.fetchall()),
                key=row_key,
            )
            if scols != sorted(dcols):
                failures.append((name, f"cols {scols} vs {sorted(dcols)}"))
            elif len(srows) != len(drows):
                failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            elif srows != drows:
                bad = next((a, b) for a, b in zip(srows, drows) if a != b)
                failures.append((name, f"values {bad}"))
            else:
                print(f"{name}: OK ({len(srows)} rows)")
        except Exception as exc:  # noqa: BLE001 - report, don't die
            failures.append((name, f"ERROR {type(exc).__name__}: {exc}"))

    for name, why in failures:
        print(f"FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
