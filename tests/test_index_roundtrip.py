"""Checkpointed shingle-index round-trip (default suite, round 10).

The ``shingles=`` parameter on :func:`ngram_jaccard_pairs` /
:func:`minhash_lsh_pairs` / :func:`informative_doc_ids`
(``operators/dedup.py``) exists for pipelines that materialize the
inverted index ONCE and feed several consumers across jobs — the round-9
measurement showed sharing the un-materialized plan object is
execution-neutral, so a persisted/checkpointed index whose scan is
already paid is the parameter's one legitimate use. Until round 10 no
test ever exercised that use end-to-end: nothing wrote an index to
parquet, started a NEW session, reloaded it, and proved the consumers
byte-match the recompute path.

This test runs exactly that pipeline in a subprocess (the session
restart must not touch the suite's shared session): session A builds the
index from sf0.01 documents, writes it to parquet, captures the
recompute-path outputs of both consumers, and stops; session B (fresh
SparkContext) reloads the parquet index, feeds it through ``shingles=``,
and the outputs must be row-for-row identical — and non-empty, so
schema-compatible-but-wrong reloads (e.g. a lossy hash column) can't
pass as trivially-equal empties.
"""

from __future__ import annotations

import os
import subprocess
import sys

from tests.conftest import SF_ORACLE

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from statline_bq_spark.session import get_spark
from statline_bq_spark.io import read_table
from statline_bq_spark.operators.dedup import (
    shingle_index, ngram_jaccard_pairs, minhash_lsh_pairs,
)

sf, out = {sf!r}, {out!r}

s1 = get_spark("index-writer")
s1.sparkContext.setLogLevel("ERROR")
docs = read_table(s1, sf, "documents")
idx = shingle_index(docs, id_col="doc_id", text_col="text", n=3)
idx.write.mode("overwrite").parquet(out + "/index")
ngram_ref = sorted(map(tuple, ngram_jaccard_pairs(docs).collect()))
lsh_ref = sorted(map(tuple, minhash_lsh_pairs(docs).collect()))
s1.stop()

s2 = get_spark("index-reader")
s2.sparkContext.setLogLevel("ERROR")
assert s2 is not s1
docs2 = read_table(s2, sf, "documents")
idx2 = s2.read.parquet(out + "/index")
ngram_ck = sorted(
    map(tuple, ngram_jaccard_pairs(docs2, shingles=idx2).collect())
)
lsh_ck = sorted(map(tuple, minhash_lsh_pairs(docs2, shingles=idx2).collect()))

assert ngram_ref, "vacuous: recompute path found no pairs"
assert lsh_ref, "vacuous: recompute path found no LSH pairs"
assert ngram_ck == ngram_ref, (
    f"ngram diverged: {{len(ngram_ck)}} vs {{len(ngram_ref)}} rows"
)
assert lsh_ck == lsh_ref, (
    f"lsh diverged: {{len(lsh_ck)}} vs {{len(lsh_ref)}} rows"
)
print(f"ROUNDTRIP_OK ngram={{len(ngram_ref)}} lsh={{len(lsh_ref)}}")
"""


def test_checkpointed_index_survives_session_restart(tmp_path):
    script = _SCRIPT.format(repo=_REPO, sf=SF_ORACLE, out=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=_REPO,
    )
    assert proc.returncode == 0, (
        f"round-trip subprocess failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    assert "ROUNDTRIP_OK" in proc.stdout
