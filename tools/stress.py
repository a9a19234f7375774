#!/usr/bin/env python
"""Scaling-slope harness: run the candidate-generation-heavy operators (plus
the no-global-window ranking/packing designs and the ANN search paths) at
1x/2x/4x/8x replications of the sf0.1 documents corpus and report wall
time + output size per scale, writing STRESS.md.

Purpose: sf-level bench proves absolute speed; this proves the SHAPE — a
bucketed/capped pipeline should grow ~linearly in corpus size (quadratic
growth means an uncapped self-join is hiding somewhere). Every TOKEN of
replica i gets an ``_ri`` suffix, so replicas share zero n-grams: the true
near-dup pair set grows linearly (k copies of the base corpus's internal
pairs), and any superlinear runtime growth is pipeline cost, not a
legitimately larger answer. (A doc-level suffix is NOT enough — replicas
would be near-dups of each other and the pair set itself would grow
quadratically, masking the measurement.)

Usage: python tools/stress.py [max_scale]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from statline_bq_spark.io import read_table  # noqa: E402
from statline_bq_spark.operators import analytic, dedup, graph, packing  # noqa: E402
from statline_bq_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def replicate(docs, k: int):
    """k disjoint-vocabulary copies: ids offset by 10^7 per replica; every
    token suffixed with the replica id so no n-gram crosses replicas."""
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1_r{i}").alias(
                "text"
            ),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


OPS = {
    "exact_dedup": lambda d: dedup.exact_dedup(d),
    "ngram_jaccard_pairs": lambda d: dedup.ngram_jaccard_pairs(d),
    "minhash_lsh_pairs": lambda d: dedup.minhash_lsh_pairs(
        d, jaccard_threshold=0.3
    ),
    "simhash_neardup_pairs": lambda d: dedup.simhash_neardup_pairs(d),
    "passage_dup_stats": lambda d: dedup.passage_dup_stats(d),
    # the two no-global-window designs: exact total-order rank via
    # range-repartition + bounded offsets, and packing offsets via a
    # two-level block prefix sum over ONE stream (the worst case a naive
    # single-partition window would serialize)
    "global_rank": lambda d: analytic.global_rank(
        d.select("doc_id"),
        [F.col("doc_id").desc()],
        num_partitions=32,
        out_col="rn",
    ),
    "pack_sequences_1stream": lambda d: packing.pack_sequences(
        d.select(
            "doc_id",
            F.size(F.split(F.trim("text"), "\\s+")).alias("n_tokens"),
            F.lit(0).alias("stream"),
        ),
        "stream",
        "doc_id",
        "n_tokens",
        2048,
    ),
    # the full dedup-clustering pipeline: simhash pair discovery feeding
    # the iterative star-contraction CC loop (the sf0.1 simhash graph has
    # chained near-dups with diameter > 10, which is precisely the case
    # min-label propagation is wrong for). The pair set grows linearly
    # (disjoint replica vocabularies), so the O(log n) round count — the
    # scale risk of an iterative operator — must stay ~flat with corpus
    # size.
    "neardup_clusters_star": lambda d: graph.connected_components_star(
        dedup.simhash_neardup_pairs(d).select("a", "b"),
        src="a",
        dst="b",
    ),
}


def replicate_embeddings(emb, k: int):
    """k copies of the embedding corpus with disjoint vec_id ranges; the
    vectors themselves repeat — fine for TIMING (the work per vector is
    identical), and the fixed 10-query set keeps per-query output at k."""
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "label",
            "embedding",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ann_ops(similarity, queries):
    return {
        "ann_cosine_topk_jvm": lambda c: similarity.ann_cosine_topk(
            c, queries, k=5
        ),
        "ann_cosine_topk_blas": lambda c: similarity.ann_cosine_topk_np(
            c, queries, k=5
        ),
        "ivf_topk_nprobe6": lambda c: similarity.ivf_topk(
            c, queries, k=5, nprobe=6
        ),
        # k-means|| seeding (2 + log2 k passes) + 2 Lloyd iterations +
        # the zero-shuffle assignment: every pass is one linear corpus
        # scan, so the whole train-and-assign must grow ~linearly — a
        # superlinear slope would mean the seeding's TakeOrdered or the
        # weighting aggregate is shuffling corpus-sized state
        "kmeans_fit_assign_k8": lambda c: similarity.kmeans_assign(
            c, similarity.kmeans_fit(c, k=8, max_iter=2)
        ),
    }


def run_ann_sweep(spark, scales, cache_root):
    """Scaling sweep for the ANN search paths over the replicated
    embeddings corpus (2k vectors × k). The 10-query probe set is fixed
    (base-corpus vec_id 0..9), so output stays Q×k rows at every scale;
    runtime growth is scan/score cost. Brute-force paths must be ~linear
    (one pass over the corpus, per-partition top-k); IVF should be
    sublinear-to-linear (probes nprobe/nlist of the lists, but the
    assignment projection is a full pass)."""
    from statline_bq_spark.operators import similarity

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("q_id"), "embedding")
    )
    queries = spark.createDataFrame(queries.collect(), queries.schema)
    ops = ann_ops(similarity, queries)
    n_base = emb.count()
    for fn in ops.values():
        fn(emb).count()
    results: dict[str, list[tuple[int, float, int]]] = {k: [] for k in ops}
    for s in scales:
        path = os.path.join(cache_root, f"emb_s{s}")
        replicate_embeddings(emb, s).repartition(4 * s).write.mode(
            "overwrite"
        ).parquet(path)
        corpus = spark.read.parquet(path)
        n = n_base * s
        for name, fn in ops.items():
            dt = min(_timed(lambda: fn(corpus).count()) for _ in range(3))
            rows = fn(corpus).count()
            results[name].append((n, dt, rows))
            print(f"scale {s}x ({n} vecs) {name}: {dt:.2f}s, {rows} rows",
                  flush=True)
    return n_base, results


def main() -> None:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scales = [s for s in (1, 2, 4, 8, 16) if s <= max_scale]
    # local mode runs executors inside the driver JVM, whose default heap
    # (1g) is far below the machine; size it like a real executor.
    spark = get_spark(
        "statline-bq-spark-stress",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()

    # warm the JVM/codegen so slopes aren't polluted by first-run compile
    for fn in OPS.values():
        fn(base).count()

    cache_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stress_cache",
    )
    results: dict[str, list[tuple[int, float, int]]] = {k: [] for k in OPS}
    for s in scales:
        # Materialize the replicated corpus AS PARQUET so (a) per-op
        # timings measure the operator, not k rounds of regexp
        # token-suffixing, and (b) Spark sees real file partitions and
        # stats — a localCheckpoint'd ExistingRDD hides sizes from the
        # planner and produced erratic join-strategy flips mid-sweep.
        path = os.path.join(cache_root, f"s{s}")
        replicate(base, s).repartition(4 * s).write.mode(
            "overwrite"
        ).parquet(path)
        corpus = spark.read.parquet(path)
        n = n_base * s
        for name, fn in OPS.items():
            # three timed runs, keep the min: single runs at these sizes
            # are GC/JIT-noisy enough to fake superlinear steps, and
            # min-of-2 still let one-off spikes through when both samples
            # landed inside the same transient (seen round 7: the same op
            # spiked at DIFFERENT scales in back-to-back full sweeps)
            dt = min(
                _timed(lambda: fn(corpus).count()) for _ in range(3)
            )
            rows = fn(corpus).count()
            results[name].append((n, dt, rows))
            print(f"scale {s}x ({n} docs) {name}: {dt:.2f}s, {rows} rows",
                  flush=True)
    n_emb, ann_results = run_ann_sweep(spark, scales, cache_root)

    import shutil

    shutil.rmtree(cache_root, ignore_errors=True)

    lines = [
        "# STRESS — scaling slope of the candidate-generation, ranking and packing pipelines",
        "",
        f"Corpus: sf0.1 documents ({n_base} docs) replicated with",
        "DISJOINT per-replica token vocabularies (every token suffixed",
        "`_ri`), so the true near-dup pair set grows linearly and runtime",
        "growth is pipeline cost, not a legitimately larger answer.",
        "Replicated corpora are materialized to parquet before timing and",
        "each op's time is the min of three runs (single runs are GC/JIT-",
        "noisy enough to fake superlinear steps); local[32], warm JVM.",
        "Generated by `python tools/stress.py`.",
        "",
        "A bucketed/capped pipeline must grow ~linearly here; sustained",
        "superlinear growth means an uncapped self-join. The last column",
        "is the time ratio vs the previous scale (2.0 = perfectly linear",
        "for a doubling).",
        "",
        "| op | docs | sec | rows out | step ratio |",
        "|---|---|---|---|---|",
    ]
    for name, rows in results.items():
        prev = None
        for n, dt, out_rows in rows:
            ratio = "" if prev is None else f"{dt / prev:.2f}x"
            lines.append(f"| {name} | {n} | {dt:.2f} | {out_rows} | {ratio} |")
            prev = dt
    lines += [
        "",
        "## ANN search paths",
        "",
        f"Corpus: sf0.1 embeddings ({n_emb} × 64-dim vectors) replicated",
        "with disjoint vec_id ranges; the 10-query probe set is FIXED",
        "(base vec_id 0..9), so output size stays Q×k at every scale and",
        "runtime growth is pure scan/score cost. Brute-force top-k (JVM",
        "fold and Arrow+BLAS) must be ~linear — one corpus pass with",
        "per-partition top-k, no corpus shuffle. IVF probes nprobe/nlist",
        "of the inverted lists after a full-pass assignment projection,",
        "so it tracks ≤ the brute-force slope with a lower constant.",
        "",
        "| op | vectors | sec | rows out | step ratio |",
        "|---|---|---|---|---|",
    ]
    for name, rows in ann_results.items():
        prev = None
        for n, dt, out_rows in rows:
            ratio = "" if prev is None else f"{dt / prev:.2f}x"
            lines.append(f"| {name} | {n} | {dt:.2f} | {out_rows} | {ratio} |")
            prev = dt
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "STRESS.md")
    # preserve the hand-maintained sf1.0 section (round 8/9): everything
    # from its heading onward survives a table regen — unless the
    # generated lines ever start emitting that heading themselves, in
    # which case appending the preserved tail would duplicate it
    # silently (ADVICE r9)
    body = "\n".join(lines)
    tail = ""
    if "## sf1.0" not in body:
        try:
            with open(path) as f:
                old = f.read()
            idx = old.find("## sf1.0")
            if idx >= 0:
                tail = "\n" + old[idx:].rstrip() + "\n"
        except OSError:
            pass
    with open(path, "w") as f:
        f.write(body + "\n" + tail)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
