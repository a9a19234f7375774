#!/usr/bin/env python
"""Build an sf1.0-like directory by replicating sf0.1 tenfold (pyarrow,
no Spark) with FK-consistent key offsets.

STRESS covers the document/embedding pipelines to 80k docs; this covers
what it can't — the relational/window/asof/streaming-twin queries, which
have never run above sf0.1 (~600k lineitem). Every key column (PK and FK
alike) in replica *i* is offset by ``i * 10^9``, so each replica is a
self-consistent universe: orders join their own customers, lineitems
their own orders/parts/suppliers, events their own users — row counts
scale 10x while join fan-outs and per-key cardinalities stay at natural
sf0.1 levels, which is exactly the TPC-H scaling model (more keys, not
hotter keys; the hot-key case is tools/dirty_sf.py build_skewed).

Documents get a per-replica token suffix (the STRESS trick) so the true
near-dup pair set grows linearly instead of quadratically; embeddings
keep their vectors (ANN corpus 10x, same 10 queries — vec_id < 10 only
exists in replica 0).

Usage: python tools/gen_sf1.py [base_sf_dir] [out_dir] [k]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

OFFSET = 1_000_000_000

# every id-bearing column, PK and FK alike, shifted by the same delta so
# intra-replica joins resolve
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replica(tbl: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return tbl
    for col in KEY_COLS.get(name, []):
        idx = tbl.schema.get_field_index(col)
        arr = tbl[col]
        shifted = pc.add(arr, pa.scalar(i * OFFSET, type=arr.type))
        tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted)
    if name == "documents":
        idx = tbl.schema.get_field_index("text")
        suffixed = pc.replace_substring_regex(
            tbl["text"].combine_chunks(), r"(\S+)", f"\\1_r{i}"
        ).cast(tbl.schema.field(idx).type)
        tbl = tbl.set_column(idx, tbl.schema.field(idx), suffixed)
    return tbl


def build(base: str, out: str, k: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t in ("region", "nation"):  # fixed-size dims
            shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        parts = [_replica(tbl, t, i) for i in range(k)]
        pq.write_table(
            pa.concat_tables(parts).combine_chunks(), dst,
            row_group_size=256 * 1024,
        )
    print(f"wrote {k}x replicated SF to {out}")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    build(base, out, int(sys.argv[3]) if len(sys.argv) > 3 else 10)
