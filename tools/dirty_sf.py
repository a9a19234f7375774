#!/usr/bin/env python
"""Build an adversarially-dirty copy of a test scale factor.

Real 100 TB corpora are dirty: failed fetches (NULL text), empty and
whitespace-only documents, boilerplate single-token docs, exact duplicates,
failed encoder calls (NULL embeddings), zero-norm vectors, NULL labels.
The fixed driver testdata contains none of these, so an oracle pair can
agree "by data luck" while its semantics silently diverge on the dirty
rows (the round-3 ADVICE found exactly one such case — a single-active-day
user class absent from sf0.01).

This tool copies a base SF directory and appends dirty rows to
``documents`` and ``embeddings`` (the LLM-pipeline tables) with pyarrow,
preserving the original parquet schemas byte-for-byte; every other table
is copied verbatim (``events`` keeps its TIMESTAMP(NANOS) type).

Usage:
    python tools/dirty_sf.py [base_sf_dir] [out_dir]
    SPARK_GRAFT_ORACLE_SF=<out_dir> python tools/check_window.py 233

Every query/oracle pair that disagrees on the dirty copy is a latent
cross-engine divergence — a bug in the Spark query, the oracle, or an
undocumented data assumption — found BEFORE a scale-up does.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# id range far above any real SF's ids so injected rows never collide
BASE_ID = 10_000_000


def dirty_documents(tbl: pa.Table) -> pa.Table:
    first_text = tbl.column("text")[0].as_py()
    rows = [
        # failed fetch: everything NULL but the id
        {"doc_id": BASE_ID + 0, "text": None, "lang": None,
         "source": None, "n_chars": None},
        # empty text
        {"doc_id": BASE_ID + 1, "text": "", "lang": "en",
         "source": "src0", "n_chars": 0},
        # whitespace-only text
        {"doc_id": BASE_ID + 2, "text": "   ", "lang": None,
         "source": "src0", "n_chars": 3},
        # pathological repetition, NULL source
        {"doc_id": BASE_ID + 3, "text": "dup dup dup dup dup dup dup dup",
         "lang": "en", "source": None, "n_chars": 31},
        # exact duplicate of an existing document (different id)
        {"doc_id": BASE_ID + 4, "text": first_text, "lang": "es",
         "source": "src0", "n_chars": len(first_text)},
        # single token, unseen lang/source values
        {"doc_id": BASE_ID + 5, "text": "x", "lang": "zz",
         "source": "srcX", "n_chars": 1},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_events(tbl: pa.Table) -> pa.Table:
    first = tbl.slice(0, 1).to_pylist()[0]
    ts0 = first["ts"]
    rows = [
        # logged-out / anonymous event: no user id
        {"event_id": BASE_ID + 0, "ts": ts0, "user_id": None,
         "event_type": "click", "value": 1.0, "props": '{"k": 1}'},
        # untyped event
        {"event_id": BASE_ID + 1, "ts": ts0, "user_id": 13,
         "event_type": None, "value": 2.0, "props": '{"k": 2}'},
        # valueless event
        {"event_id": BASE_ID + 2, "ts": ts0, "user_id": 13,
         "event_type": "click", "value": None, "props": None},
        # malformed JSON payload
        {"event_id": BASE_ID + 3, "ts": ts0, "user_id": 12,
         "event_type": "click", "value": 3.0, "props": '{bad json'},
        # clock-less event (NULL timestamp)
        {"event_id": BASE_ID + 4, "ts": None, "user_id": 12,
         "event_type": "click", "value": 4.0, "props": '{"k": 4}'},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_embeddings(tbl: pa.Table) -> pa.Table:
    dim = len(tbl.column("embedding")[0].as_py())
    first_vec = tbl.column("embedding")[0].as_py()
    rows = [
        # failed encoder call
        {"vec_id": BASE_ID + 0, "embedding": None, "label": None},
        # zero-norm vector (cosine undefined; ANSI divide hazard)
        {"vec_id": BASE_ID + 1, "embedding": [0.0] * dim, "label": 0},
        # exact duplicate vector, NULL label
        {"vec_id": BASE_ID + 2, "embedding": first_vec, "label": None},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def build(base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            pq.write_table(dirty_documents(pq.read_table(src)), dst)
        elif t == "embeddings":
            pq.write_table(dirty_embeddings(pq.read_table(src)), dst)
        elif t == "events":
            pq.write_table(dirty_events(pq.read_table(src)), dst)
        else:
            shutil.copyfile(src, dst)
    print(f"wrote dirty SF to {out}")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_dirty_sf"
    build(base, out)
