"""Memory-pressure degradation sweep (opt-in: SPARK_GRAFT_SPILL=1).

Every bench capture through round 9 recorded spill 0 — meaning
Spark-managed spill, the mechanism a 100 TB cluster lives on when a
partition outgrows executor memory, had never actually EXECUTED in this
engine's tests. "Would spill gracefully" was an assumption, not a
measurement (and the round-8 1g-OOM find proved the memory axis bites
for real: ``session.py`` grew a heap clamp from it).

This sweep runs the heaviest oracle-paired bench queries at sf0.1 inside
a deliberately starved session — a 1500m driver heap (local mode: that
IS the executor heap) with ``spark.memory.fraction=0.05``, leaving the
unified execution+storage pool ~60 MB — and pins all three properties of
graceful degradation at once:

- the query COMPLETES (no OOM — the starved pool forces sort/agg
  spill-to-disk, not a crash);
- the result still MATCHES the DuckDB oracle rows+schema+values (spill
  and merge passes must not duplicate, drop, or reorder-sensitive rows);
- the sweep actually SPILLED (cumulative spilled bytes > 0 via the UI
  REST counters) — otherwise the whole test is vacuous and the knobs
  need re-tightening, not celebrated.

Probed before pinning (round 10): this config spills ~360 MB across the
five queries (~311 MB in ngram_jaccard_pairs' inverted-index sort alone)
with identical row counts to the unclamped run.

MUST RUN STANDALONE (`SPARK_GRAFT_SPILL=1 pytest tests/test_spill_parity.py`):
driver memory is a JVM-launch-time property, so an already-running
session would silently un-starve the sweep. ~3 min.
"""

from __future__ import annotations

import json
import os
import urllib.request

import pytest

from tests.conftest import TESTDATA
from tests.test_dirty_parity import _check

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SPILL"),
    reason="memory-pressure sweep is opt-in (SPARK_GRAFT_SPILL=1) and "
    "must run standalone (needs a freshly launched 1500m-heap JVM)",
)

SF_DIR = f"{TESTDATA}/sf0.1"

#: Heaviest oracle-paired headliners (VERDICT r9 plan-audit list, raw
#: variants swapped for their oracle-checked twins so values are verified,
#: not just row counts).
HEAVY = (
    "ngram_jaccard_pairs",
    "passage_dup_docs",
    "minhash_neardup_pairs",
    "simhash_fingerprints",
    "session_windows",
    # round 12 (VERDICT r11 #3): every operator that grew a lazy
    # localCheckpoint in round 11 must prove value parity under the
    # starved pool — fuzzy joins the four above so all five
    # checkpointed paths (minhash/ngram/simhash/passage/fuzzy) run here.
    "fuzzy_supplier_names",
)


@pytest.fixture(scope="session")
def starved_spark():
    from pyspark.sql import SparkSession

    from statline_bq_spark.session import get_spark

    if SparkSession.getActiveSession() is not None:
        pytest.skip(
            "an existing session is active; the starved heap can only be "
            "set at JVM launch — run this module standalone"
        )
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "1500m"
    try:
        s = get_spark(
            "spill-sweep",
            shuffle_partitions=2,
            extra_conf={
                "spark.ui.enabled": "true",
                # ~60 MB unified pool: forces execution spill at sf0.1
                # without starving Spark's reserved overhead into an OOM
                "spark.memory.fraction": "0.05",
            },
        )
    finally:
        os.environ.pop("SPARK_GRAFT_DRIVER_MEM", None)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _spilled_bytes(spark) -> int:
    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages?status=complete"
    )
    stages = json.load(urllib.request.urlopen(url, timeout=10))
    return sum(
        s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
        for s in stages
    )


@pytest.mark.parametrize("name", HEAVY)
def test_query_matches_oracle_under_memory_pressure(starved_spark, name):
    _check(starved_spark, SF_DIR, name)


def test_checkpoint_blocks_persist_under_pressure(starved_spark):
    """Round 12 (VERDICT r11 #3): the round-11 lazy localCheckpoints hold
    corpus-derived shingle/fingerprint blocks at MEMORY_AND_DISK inside
    executor storage. Under the starved unified pool the spilling
    sorts/aggregates reclaim execution memory and push those blocks to
    disk — this pins that the blocks (a) actually register in the block
    manager, (b) survive the pressure with the query still computing the
    same result on a SECOND execution (which re-reads the checkpoint
    blocks instead of recomputing lineage), and (c) the round-trip is
    observable (storage used > 0 while the DataFrame is alive).

    Lineage-loss failure mode, recorded: locally-checkpointed blocks are
    NOT recomputable — on a real cluster, losing an executor that holds
    them fails the job (Spark resubmits nothing; the checkpoint severed
    the lineage). That is the standard localCheckpoint trade accepted in
    round 11 for cutting the triple re-execution of the shingle subtree;
    a reliability-critical deployment swaps it for checkpoint() to a
    replicated store at the cost of a write. Value parity under the same
    pressure is covered for all five checkpointed operators by the HEAVY
    oracle sweep above."""
    from statline_bq_spark.workload import QUERIES

    df = QUERIES["minhash_pairs_raw"](starved_spark, SF_DIR)
    n1 = df.count()
    # second execution re-reads the checkpointed blocks (possibly from
    # their disk copies after eviction) — same result required
    assert df.count() == n1
    url = (
        f"{starved_spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{starved_spark.sparkContext.applicationId}/storage/rdd"
    )
    rdds = json.load(urllib.request.urlopen(url, timeout=10))
    held = [r for r in rdds if r.get("numCachedPartitions", 0) > 0]
    assert held, (
        "no checkpointed RDD blocks registered in the block manager — "
        "the lazy localCheckpoint path is not materializing"
    )
    used = sum(r.get("memoryUsed", 0) + r.get("diskUsed", 0) for r in held)
    assert used > 0, "checkpoint blocks registered but hold zero bytes"


def test_sweep_actually_spilled(starved_spark):
    """Runs LAST (file order): if the starved pool never forced a spill,
    the sweep proved nothing — fail loudly so the knobs get re-tightened
    instead of the zero reading being mistaken for graceful behavior."""
    spilled = _spilled_bytes(starved_spark)
    assert spilled > 0, (
        "no spill occurred under the starved config — the sweep is "
        "vacuous; tighten spark.memory.fraction or the heap"
    )
