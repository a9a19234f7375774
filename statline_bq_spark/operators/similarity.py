"""Similarity search over embedding columns (north star, BASELINE.json).

Two tiers, mirroring how ANN systems are deployed on data pipelines:

- ``ann_cosine_topk``: brute-force exact top-k — the correctness baseline.
  The (small) query set is broadcast, so the big corpus is scanned once with
  zero shuffle of the embedding column; per-row math is a JVM-side
  sequential fold (functions/vectors.py). A per-query top-k window trims
  results. At 100 TB the same plan holds: broadcast Q queries, mapper-side
  score, TakeOrdered per query.

- ``lsh_bucket_topk``: multi-table random-hyperplane (sign) LSH — the scale
  path. Each vector gets a B-bit signature per hash table from fixed
  pseudo-random hyperplanes (deterministic, seeded); candidates are corpus
  rows sharing a query's bucket in ANY table; exact cosine re-ranks the
  candidate set. Multiple tables are what buy recall (single-table sign-LSH
  recall is (1-θ/π)^B — e.g. ~0.16 for 4 bits at the ~66° angles typical of
  nearest neighbors among random 64-d vectors; L tables lift it to
  1-(1-p)^L). This turns the O(N·Q) scan into a bucket-join whose cost is
  the collision count. Hyperplanes are generated driver-side (tiny:
  L×B×dim floats) and shipped as literals — no extra table, no shuffle
  beyond the bucket join.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from statline_bq_spark.functions.vectors import cosine_similarity


def ann_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 5,
    round_to: int | None = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` must carry (query_id_col, vec_col). Output:
    (q_id, neighbor_id, rn, sim) — rn 1..k by descending similarity with the
    neighbor id as deterministic tiebreaker; self-matches excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("q_id"), F.col(vec_col).alias("_q_vec")
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_c_vec")
        )
        .join(q, F.col("neighbor_id") != F.col("q_id"), "inner")
        .withColumn("_sim", cosine_similarity(F.col("_c_vec"), F.col("_q_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id")
    )
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "q_id",
            "neighbor_id",
            "rn",
            (F.round("_sim", round_to) if round_to is not None else F.col("_sim")).alias(
                "sim"
            ),
        )
    )
    return out


def ann_cosine_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    k: int = 5,
    round_to: int | None = 4,
) -> DataFrame:
    """Brute-force ANN, Arrow + BLAS edition: one matmul scores a whole
    Arrow batch against every query at once (``mapInPandas``), each
    partition emits only its per-query top-k, and a final window merges the
    per-partition candidates (Q × k × partitions rows — tiny).

    Same contract as :func:`ann_cosine_topk`; the neighbor SETS match (a
    test pins that), but sims are summed by BLAS in blocked order rather
    than a sequential fold, so value hashes aren't cross-engine-stable →
    rows-only check for the query entry.

    The query set is collected to the driver by design — it is the bounded
    side (10s-1000s of vectors), and shipping it inside the closure is
    exactly what `broadcast` would do anyway.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(query_id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("queries is empty")
    q_ids = np.array([r[0] for r in q_rows], dtype="int64")
    qm = np.asarray([list(map(float, r[1])) for r in q_rows], dtype="float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            m = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qm.T  # (batch, n_queries)
            frames = []
            for j in range(len(q_ids)):
                col = sims[:, j]
                keep = ids != q_ids[j]
                cid, csim = ids[keep], col[keep]
                # order by (-sim, id): lexsort's last key is primary
                order = np.lexsort((cid, -csim))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "q_id": q_ids[j],
                            "neighbor_id": cid[order],
                            "sim": csim[order],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, "q_id bigint, neighbor_id bigint, sim double"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "q_id",
            "neighbor_id",
            "rn",
            (
                F.round("sim", round_to)
                if round_to is not None
                else F.col("sim")
            ).alias("sim"),
        )
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (sign LSH only needs
    directions)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def signature_expr(vec_col: str, planes: list[list[float]]):
    """Bit-signature expression: bit b = sign(vec · plane_b) ≥ 0.

    Pure built-in fold per plane; planes ship as array literals.
    """
    v = F.col(vec_col).cast("array<double>")
    sig = F.lit(0).cast("bigint")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(v, p, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        mask = F.lit((1 << b)).cast("bigint")
        sig = sig.bitwiseOR(F.when(d >= 0, mask).otherwise(F.lit(0).cast("bigint")))
    return sig


def _bucket_array(vec_col: str, all_planes: list[list[list[float]]]):
    """array<struct<table_id,bucket>> — one LSH bucket per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                signature_expr(vec_col, planes).alias("bucket"),
            )
            for t, planes in enumerate(all_planes)
        ]
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates share a query's bucket in any of
    ``tables`` hash tables; exact cosine re-ranks the deduped candidates."""
    all_planes = [
        _hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)
    ]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_c_vec"),
        F.explode(_bucket_array(vec_col, all_planes)).alias("_b"),
    ).select("neighbor_id", "_c_vec", "_b.table_id", "_b.bucket")
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("q_id"),
            F.col(vec_col).alias("_q_vec"),
            F.explode(_bucket_array(vec_col, all_planes)).alias("_b"),
        ).select("q_id", "_q_vec", "_b.table_id", "_b.bucket")
    )
    candidates = (
        c.join(q, ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "_q_vec", "neighbor_id", "_c_vec")
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    scored = candidates.withColumn(
        "_sim", cosine_similarity(F.col("_c_vec"), F.col("_q_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "rn", F.round("_sim", 4).alias("sim"))
    )


def cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim ≥ threshold).

    Brute-force all-pairs — the exact baseline; at scale run
    ``lsh_bucket_topk``-style bucketing first and this as the in-bucket
    verifier.
    """
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("sim", F.round(cosine_similarity(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("a", "b", "sim")
    )


def centroids_by_label(
    df: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Per-label centroid, long form: (label, pos, centroid_val).

    posexplode → groupBy(label, pos) → avg. One shuffle on (label, pos);
    at 100 TB pre-aggregate per partition happens automatically (partial
    avg), so the shuffle carries only group partials.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    return exploded.groupBy("label", "pos").agg(
        F.round(F.avg("val"), round_to).alias("centroid_val")
    )


def _centroid_vectors(
    df: DataFrame, *, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, _cvec: array<double>) — per-label mean vectors, assembled from
    the long-form centroids without any driver-side collect."""
    long = centroids_by_label(
        df, label_col=label_col, vec_col=vec_col, round_to=6
    )
    return long.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
            lambda s: s["centroid_val"],
        ).alias("_cvec")
    )


def _assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    nprobe: int,
) -> DataFrame:
    """Attach the ``nprobe`` nearest centroid labels to every vector:
    (id, vec, label). Centroids are a bounded dimension → broadcast
    nested-loop scoring, then a per-id top-nprobe window."""
    scored = (
        df.select(F.col(id_col).alias("_aid"), F.col(vec_col).alias("_avec"))
        .join(F.broadcast(centroids))
        .withColumn("_csim", cosine_similarity(F.col("_avec"), F.col("_cvec")))
    )
    w = Window.partitionBy("_aid").orderBy(F.col("_csim").desc(), F.col("label"))
    return (
        scored.withColumn("_crn", F.row_number().over(w))
        .filter(F.col("_crn") <= nprobe)
        .select(
            F.col("_aid").alias(id_col),
            F.col("_avec").alias(vec_col),
            "label",
        )
    )


def kmeans_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 5,
    seed: int = 42,
    round_to: int = 6,
) -> list[list[float]]:
    """Distributed Lloyd's k-means over an embedding column; returns the
    trained codebook as a k×dim list (driver-side — a codebook is bounded
    by definition, k·dim floats, exactly what MLlib's KMeans also collects
    and broadcasts every iteration).

    Scale shape per iteration: ONE ``mapInPandas`` pass assigns every row
    to its nearest centroid with a BLAS matmul against the broadcast
    codebook and emits only per-(batch, cluster) partial sums — k rows per
    Arrow batch, each carrying a dim-length sum vector and a count. The
    global reduce is a groupBy(cid) over those partials (posexplode →
    sum), so the shuffle moves k·num_batches tiny rows, never the corpus.
    No corpus-wide join, no N-row shuffle, no lineage growth (each
    iteration reads the same source scan).

    Initialisation is deterministic farthest-first traversal (the k-center
    2-approximation): seed 1 is the row with the smallest
    ``xxhash64(id, seed)``; each further seed is the row farthest from its
    nearest already-chosen seed (ties broken by the same hash). That is
    k-1 extra max-reduce scans — the same pass-count trade MLlib's
    k-means|| makes — and unlike a uniform draw it cannot put two seeds in
    one dense region and merge well-separated clusters into a local
    optimum. Empty clusters keep their previous centroid. Centroids are
    rounded to ``round_to`` dp each iteration so results don't drift with
    shuffle order across runs.
    """
    import numpy as np
    import pandas as pd

    dim = df.select(F.size(F.col(vec_col).cast("array<double>"))).first()[0]
    hashed = df.select(
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"),
    )
    first = hashed.orderBy("_h").limit(1).collect()
    if not first:
        raise ValueError("cannot fit k-means on an empty DataFrame")
    chosen = [[float(x) for x in first[0]["_v"]]]
    norm2 = F.aggregate(
        F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    for _ in range(k - 1):
        # distance to the NEAREST chosen seed; pick the farthest row
        dists = []
        for cent in chosen:
            c = F.array(*[F.lit(x) for x in cent])
            dot = F.aggregate(
                F.zip_with(F.col("_v"), c, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            dists.append(norm2 - 2 * dot + F.lit(sum(x * x for x in cent)))
        mind = F.least(*dists) if len(dists) > 1 else dists[0]
        far = (
            hashed.select("_v", "_h", mind.alias("_d"))
            .orderBy(F.col("_d").desc(), "_h")
            .limit(1)
            .collect()
        )
        chosen.append([float(x) for x in far[0]["_v"]])
    centroids = np.asarray(chosen, dtype="float64")

    src = df.select(F.col(vec_col).alias("_v"))
    out_schema = "cid int, psum array<double>, n bigint"

    for _ in range(max_iter):
        cmat = centroids.copy()  # closure-captured snapshot for this pass
        half_norms = 0.5 * (cmat * cmat).sum(axis=1)

        def partial_sums(batches, _c=cmat, _h=half_norms):
            for pdf in batches:
                if pdf.empty:
                    continue
                m = np.asarray(
                    [np.asarray(v, dtype="float64") for v in pdf["_v"]]
                )
                # argmin ||x-c||^2 == argmax (x·c - ||c||^2/2)
                cid = np.argmax(m @ _c.T - _h, axis=1)
                rows = []
                for c in np.unique(cid):
                    sel = m[cid == c]
                    rows.append(
                        {
                            "cid": int(c),
                            "psum": sel.sum(axis=0).tolist(),
                            "n": int(sel.shape[0]),
                        }
                    )
                yield pd.DataFrame(rows)

        agg = (
            src.mapInPandas(partial_sums, out_schema)
            .select("cid", "n", F.posexplode("psum").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.sum("val").alias("s"),
                F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("cnt"),
            )
            .collect()
        )
        counts = [0] * k
        sums = np.zeros((k, dim), dtype="float64")
        for r in agg:
            sums[r["cid"], r["pos"]] = r["s"]
            if r["cnt"] is not None:
                counts[r["cid"]] = r["cnt"]
        new = centroids.copy()  # empty cluster -> keep previous centroid
        for c in range(k):
            if counts[c] > 0:
                new[c] = np.round(sums[c] / counts[c], round_to)
        if np.array_equal(new, centroids):
            break
        centroids = new
    return [list(map(float, row)) for row in centroids]


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Attach (cid, dist2) — nearest trained centroid and squared L2 — as a
    pure JVM-side projection: the codebook ships as array literals and each
    row evaluates k folded dot products, so the plan is scan → project with
    ZERO shuffle (the assignment step of IVF index build at 100 TB).

    Ties break toward the smaller cid (struct-max lexicographic order).
    """
    v = F.col(vec_col).cast("array<double>")
    scored = []
    for cid, cent in enumerate(centroids):
        c = F.array(*[F.lit(float(x)) for x in cent])
        half_norm = 0.5 * sum(x * x for x in cent)
        dot = F.aggregate(
            F.zip_with(v, c, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # argmin dist2 == argmax (dot - ||c||^2/2); negative cid so the
        # lexicographic struct max prefers the SMALLER cid on score ties
        scored.append(
            F.struct(
                (dot - F.lit(half_norm)).alias("score"),
                F.lit(-cid).alias("neg_cid"),
            )
        )
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    norm2 = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return df.withColumn("_best", best).select(
        "*",
        (-F.col("_best.neg_cid")).alias("cid"),
        F.round(norm2 - 2 * F.col("_best.score"), round_to).alias("dist2"),
    ).drop("_best")


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    n_clusters: int = 8,
    max_iter: int = 4,
    seed: int = 42,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer: k-means codebook instead
    of :func:`ivf_topk`'s label-mean stand-in. Same search path — inverted
    lists keyed by nearest centroid, probe ``nprobe`` lists per query,
    exact cosine re-rank — but the lists now follow the data's own
    geometry, so recall holds when labels don't align with clusters."""
    spark = corpus.sparkSession
    codebook = kmeans_fit(
        corpus,
        vec_col=vec_col,
        id_col=id_col,
        k=n_clusters,
        max_iter=max_iter,
        seed=seed,
    )
    cents = F.broadcast(
        spark.createDataFrame(
            [(cid, vec) for cid, vec in enumerate(codebook)],
            "label int, _cvec array<double>",
        )
    )
    corpus_lists = _assign_to_centroids(
        corpus, cents, id_col=id_col, vec_col=vec_col, nprobe=1
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_c_vec"),
        "label",
    )
    query_probes = _assign_to_centroids(
        queries, cents, id_col=query_id_col, vec_col=vec_col, nprobe=nprobe
    ).select(
        F.col(query_id_col).alias("q_id"), F.col(vec_col).alias("_q_vec"), "label"
    )
    candidates = (
        corpus_lists.join(query_probes, "label")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "neighbor_id"])
        .withColumn("_sim", cosine_similarity(F.col("_c_vec"), F.col("_q_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("neighbor_id"))
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "rn", F.round("_sim", 4).alias("sim"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    label_col: str = "label",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    inverted lists keyed by nearest centroid, probe the ``nprobe`` nearest
    lists per query, exact-cosine re-rank inside them.

    The coarse quantizer here is the per-``label`` mean vector (a
    deterministic stand-in for a k-means codebook — swap `_centroid_vectors`
    for trained centroids without touching the search path). Everything is
    DataFrame-native: centroids stay distributed and broadcast-joined; the
    only corpus-wide shuffle is the candidate equi-join on the centroid
    label, which is exactly the inverted-list probe — scan cost per query
    drops from O(N) to O(N·nprobe/nlist).

    Output: (q_id, neighbor_id, rn, sim) like ``ann_cosine_topk`` — but
    approximate: neighbors outside the probed lists are missed.
    """
    cents = _centroid_vectors(corpus, label_col=label_col, vec_col=vec_col)
    corpus_lists = _assign_to_centroids(
        corpus, cents, id_col=id_col, vec_col=vec_col, nprobe=1
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_c_vec"),
        "label",
    )
    query_probes = _assign_to_centroids(
        queries, cents, id_col=query_id_col, vec_col=vec_col, nprobe=nprobe
    ).select(
        F.col(query_id_col).alias("q_id"), F.col(vec_col).alias("_q_vec"), "label"
    )
    candidates = (
        corpus_lists.join(query_probes, "label")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "neighbor_id"])
        .withColumn("_sim", cosine_similarity(F.col("_c_vec"), F.col("_q_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("neighbor_id"))
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "rn", F.round("_sim", 4).alias("sim"))
    )
