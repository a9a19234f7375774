#!/usr/bin/env python
"""Build a ZERO-ROW, schema-preserving copy of a test scale factor.

At 100 TB an upstream filter, a new date partition, or a cold-start
tenant legitimately produces EMPTY inputs — and a pipeline must compose
them to empty outputs, not die. The round-7 first run of this probe
found 17 real defects across the registry: Spark's cube/rollup/grouping
-sets omit even the grand-total row on empty input while ANSI/DuckDB
emit a count-0 () row, sum()/max() over empty NULL'ed pinned report
flags on one engine only, k-means fits and the numpy/Arrow ANN paths
raised driver exceptions ("cannot fit", "queries is empty"), and
revenue_pareto's global-agg-vs-GROUP-BY shapes disagreed on row COUNT
(1 vs 0) — a divergence also live on any sub-5-row input.

Usage:
    python tools/empty_sf.py [base_sf_dir] [out_dir]
    SPARK_GRAFT_ORACLE_SF=<out_dir> python tools/check_window.py 233
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build(
    base: str,
    out: str,
    rows: int | None = 0,
    repeat: int = 1,
    null_payloads: bool = False,
) -> None:
    """rows=0: the empty probe. rows=1: the SINGLE-ROW probe — tiny
    partitions where n-1 variance, percentile ranks and top-k caps all
    degenerate; its first run found the ANN recall oracles overcounting
    expected pairs (count(*) * k with no corpus-size cap) and the
    histogram contract asserting data-dependent facts.
    rows=1, repeat=50: the CONSTANT-CORPUS probe — every row identical
    (zero variance at n>1, one distinct value carrying all mass,
    duplicated keys everywhere); its first run found keyword_in_context
    fanning out hits x copies through a join-back on doc_id, and the
    histogram balance bound missing its tie-mass term (rank-selected
    boundaries cannot split equal values).
    null_payloads=True (with rows=None, keep all): the ALL-NULL-PAYLOAD
    probe — normal row counts but every text/props/embedding NULL (a
    fully-degraded feed); its first run found the bitext oracle scoring
    NULL vectors (held by data luck), DuckDB ranking zero-norm cosines
    at -1.0 where Spark's try_divide NULL drops them, and the simhash
    planted-pair contract counting unfingerprintable NULL-text docs."""
    import pyarrow as pa

    _null_cols = {
        "documents": ["text"],
        "events": ["props"],
        "embeddings": ["embedding"],
    }
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(base, f"{t}.parquet"))
        if rows is not None:
            tbl = tbl.slice(0, rows)
        if repeat > 1:
            tbl = pa.concat_tables([tbl] * repeat)
        if null_payloads:
            for c in _null_cols.get(t, []):
                i = tbl.schema.get_field_index(c)
                tbl = tbl.set_column(
                    i,
                    tbl.schema.field(i),
                    pa.nulls(len(tbl), tbl.schema.field(i).type),
                )
        pq.write_table(tbl, os.path.join(out, f"{t}.parquet"))
    print(f"wrote degenerate SF to {out}")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_empty_sf"
    # argv[3]: row cap, or the sentinel "null"/"none" to keep all rows
    raw_rows = sys.argv[3] if len(sys.argv) > 3 else "0"
    build(
        base,
        out,
        rows=None if raw_rows.lower() in ("null", "none") else int(raw_rows),
        repeat=int(sys.argv[4]) if len(sys.argv) > 4 else 1,
        null_payloads=len(sys.argv) > 5
        and sys.argv[5].lower() in ("1", "true", "null_payloads"),
    )
