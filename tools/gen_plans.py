#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical-plan snapshots for
representative queries, with the scale rationale for each. Run after any
plan-affecting change; the enforced invariants live in tests/test_plans.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from statline_bq_spark.session import get_spark  # noqa: E402
from statline_bq_spark.workload import QUERIES  # noqa: E402

NOTES = {
    "star_schema_agg": (
        "Flagship star join (SURVEY Q1/Q6). Dimensions broadcast; the fact "
        "scan is the only wide input; aggregation is partial (map-side) then "
        "final. At cluster scale AQE keeps the dim broadcasts and re-plans "
        "the fact exchange from observed sizes."
    ),
    "training_data_pipeline": (
        "North-star composite (quality gate → exact dedup → chunk → hash "
        "split → stats) as one plan: the scan reads only (doc_id, text, "
        "lang) — column pruning across five logical stages — and the dedup "
        "groupBy is the single wide stage before the final aggregate."
    ),
    "customer_order_distribution": (
        "TPC-H Q13 shape: the ON-clause filter stays in the join (not a "
        "WHERE), preserving zero-order customers; the per-customer count "
        "reuses the join's partitioning, so only the tiny histogram "
        "aggregate reshuffles."
    ),
    "asof_click_before_purchase": (
        "As-of join via the union-merge formulation: one shuffle + one "
        "sort serve both sides; no range-explosion, no broadcast of the "
        "big side."
    ),
    "minhash_pairs_raw": (
        "MinHash-LSH: shingles are 64-bit hashes from the first map stage "
        "on; every shuffle moves 8-byte keys, never text. Candidate pairs "
        "come from per-bucket member arrays (one groupBy on (band, "
        "bucket-hash), ordered pairs enumerated in place) — no bucket "
        "self-join, no sort passes; the degenerate-bucket cap is a "
        "broadcast LeftAnti against the small heavy-hitter set enforced "
        "BEFORE collect_list, so array state is bounded by the cap. The "
        "exact-Jaccard verify carries per-doc set sizes along the index "
        "rows (a collect_list/size re-aggregation riding the existing _id "
        "partitioning — no extra window or shuffle), so one hash "
        "aggregate finishes the query — the pair relation is never "
        "re-shuffled after enumeration."
    ),
    "simhash_pairs_raw": (
        "SimHash near-dup pairs: the 64-bit fingerprint is built from 32 "
        "lane-packed bit-count sums over the exploded token stream (two "
        "32-bit lanes per bigint — codegen'd hash-agg with map-side "
        "partials; the 64-bit vote fold happens once per DOC via "
        "higher-order functions). Block-permutation buckets give exact "
        "recall for hamming <= max_hamming by pigeonhole; candidate pairs "
        "are enumerated in place from per-bucket member arrays (bounded "
        "by the heavy-bucket broadcast-anti cap) with bit_count(a XOR b) "
        "computed inline — no bucket self-join, and nothing joins after "
        "enumeration."
    ),
    "market_share": (
        "TPC-H Q8 shape: both nation decode chains and the region filter "
        "broadcast; the conditional CASE aggregate runs map-side inside "
        "the final hash aggregate, so the ratio costs nothing beyond the "
        "star join itself."
    ),
    "important_parts": (
        "TPC-H Q11 shape (global scalar subquery): the per-part aggregate "
        "is localCheckpoint-materialized because its two consumers (grand "
        "total, threshold filter) prune different columns and Catalyst "
        "would otherwise replay the whole fact join twice. The plan "
        "therefore starts from ExistingRDD — lineitem is scanned exactly "
        "once per run."
    ),
    "ivf_topk_raw": (
        "IVF probe: the corpus-side nearest-centroid assignment is a "
        "zero-shuffle ArrowEvalPython/mapInPandas stage (the bounded "
        "codebook ships in the task closure; one BLAS matmul per Arrow "
        "batch), so the only corpus-wide exchange is the inverted-list "
        "equi-join on the centroid label — exactly the probe. The query "
        "side scores against a literal-backed local relation; the centroid "
        "aggregation subplan runs once, not per consumer."
    ),
    "cosine_near_dup_pairs": (
        "Exact all-pairs cosine, blocked: vectors join a broadcast "
        "P(P+1)/2 block-pair grid on their hash-block id, then equi-join "
        "the partner block — the distributed-matmul shape. No "
        "BroadcastNestedLoopJoin, no full-table broadcast; the N^2/2 "
        "compute spreads evenly over independent block-pair tasks and "
        "the data moved is N*(P+1)/2 rows."
    ),
    "gap_fill_hourly": (
        "Dense-grid forward fill: the only full-data pass is the tumbling "
        "groupBy; bounds, keys, and the exploded time spine all derive "
        "from the (small) bucketed aggregate, which broadcasts into the "
        "grid join. The forward-fill window partitions by key over "
        "#buckets rows, never raw events."
    ),
    "ngram_jaccard_pairs": (
        "Exact Jaccard over a capped inverted index: grams seen in >128 "
        "docs (the small heavy-hitter set) are removed by a broadcast "
        "LeftAnti, bounding the sum-of-bucket-squared blowup a "
        "boilerplate shingle would cause without ever shuffling the index "
        "for the cap; set sizes come from the same capped universe so the "
        "Jaccard stays exact over informative grams (oracle mirrors the "
        "cap). Pairs are enumerated in place from per-gram "
        "struct<doc,size> arrays (bounded by the cap) and finished by a "
        "single hash aggregate with the Jaccard computed inline — no "
        "self-join, and the candidate-pair relation (the largest in the "
        "query at scale) is never sorted or joined after enumeration."
    ),
    "packed_sequences": (
        "Concat-then-chunk sequence packing: the per-stream token prefix "
        "sum is a two-level block scan — within-block windows partition on "
        "(stream, block) so no task sorts more than block_size rows, and "
        "the per-block-totals window runs after a HashAggregate over "
        "#blocks rows. The block-prefix join broadcasts. A naive global "
        "window would serialize each stream into one task."
    ),
    "mixture_sampled_docs": (
        "Temperature mixture resampling: per-source keep rates derive "
        "from one count aggregate (#sources rows) and broadcast back; the "
        "md5 keep/drop decision is a map-side filter, so the corpus is "
        "never exchanged before the final per-source summary."
    ),
    "hourly_anomalies": (
        "Trailing-window anomaly flags: one tumbling hash-aggregate "
        "collapses events to #hours rows per key (map-side partials), "
        "then the RANGE-frame window runs over that aggregate only — raw "
        "events never enter a window. The same flag operator serves the "
        "streaming monitor over micro-batch partial counts."
    ),
    "event_funnel": (
        "Ordered funnel: three conditional min-aggregates chained by "
        "user-keyed joins — each stage's shuffle carries #users rows, the "
        "event stream is never globally sorted and no per-user event list "
        "is materialized. The sequencing constraint (stage N strictly "
        "after stage N-1's first completion) lives in join-side filters."
    ),
    "passage_dup_docs": (
        "Inter-doc shared-passage fraction: inverted index → gram "
        "document-frequency aggregate → gram-keyed join back, with the "
        "gram join sort-merge-pinned (corpus-sized side) and the index's "
        "exchange reused between the aggregate and the probe. Shuffles "
        "carry 8-byte gram hashes, never text."
    ),
    "semantic_decontaminated": (
        "Embedding-based decontamination: ONE BroadcastNestedLoopJoin "
        "LeftAnti against the (small, broadcast) benchmark side — the "
        "corpus scans once, is never shuffled by the filter, and the "
        "round-4 cosine threshold evaluates inside the join condition. "
        "The only exchange is the final per-label aggregate."
    ),
    "fuzzy_supplier_names": (
        "Fuzzy entity resolution: char-trigram inverted index with the "
        "heavy grams removed by broadcast LeftAnti (the index never "
        "shuffles for the cap), equi self-join for candidates (never "
        "cartesian — plan-gated), then the JVM levenshtein intrinsic "
        "verifies only candidate pairs with a length-difference "
        "prefilter."
    ),
    "tfidf_top_terms": (
        "Log-free TF-IDF: tokenize → (doc,term) counts → term document "
        "frequencies → join back on term. Every wide stage keys on term "
        "or (doc_id, term); the corpus size N is a one-row broadcast "
        "(the only SinglePartition exchange), and the ranking window "
        "partitions by doc_id — no global window anywhere."
    ),
    "epoch_shuffle_order": (
        "Deterministic training shuffle (round 3): the permutation key is "
        "md5(seed || id), the shard is its first two nibbles (256 "
        "shards — ~400 GB per window sort at 100 TB), and the position "
        "window partitions by shard — the sort is range-partitionable "
        "per shard, never a single-task global row_number. Two epochs = "
        "two narrow branches over one scan, unioned."
    ),
    "fingerprint_snapshot_diff": (
        "Row-fingerprint diff (round 3): each side collapses to "
        "(key, md5-of-canonical-payload) BEFORE the full outer join, so "
        "the wide stage ships 16-byte hashes, not payload columns; class "
        "counting is a bounded 4-row aggregate after a row-level CASE."
    ),
    "rolling_7d_active_users": (
        "Sliding distinct actives (round 3): contribution expansion "
        "(sequence+explode, 7 rows per distinct user-day) replaces the "
        "range self-join that rescans a 7-day window per day; the day "
        "clip is a broadcast join against the bounded day set, and the "
        "only wide stage is the count-distinct aggregate."
    ),
    "token_budget_docs": (
        "Per-source token-budget fill (round 3): one shuffle co-locates "
        "each source, the running sum is a source-partitioned window "
        "(no global window), and the budget filter is a row-level "
        "predicate on the cumulative column."
    ),
    "incremental_agg_state": (
        "Mergeable-partials view maintenance (round 3): base and delta "
        "partials are two branches of one scan; the merge re-aggregates "
        "one row per group — at steady state the delta side is the only "
        "scan and the merge shuffles |groups| rows, never history. The "
        "query's full-recompute branch exists only to pin equality."
    ),
}


def main() -> None:
    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = [
        "# Physical plans (generated; `python tools/gen_plans.py`)",
        "",
        '`.explain("formatted")` snapshots at sf0.01 for representative',
        "queries, with the scale rationale. Regenerate after plan-affecting",
        "changes — the plan-quality gates in `tests/test_plans.py` enforce the",
        "invariants (pushdown, pruning, broadcast choices, no Python in hot",
        "paths); this file is the human-readable tour.",
        "",
    ]
    for name, note in NOTES.items():
        plan = QUERIES[name](spark, sf)._jdf.queryExecution().explainString(mode)
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", tree, "```", ""]
    target = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(target, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {target}")
    spark.stop()


if __name__ == "__main__":
    main()
