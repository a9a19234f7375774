"""Operator-level unit tests for pieces the oracle-parity suite can't see:
multimodal plumbing, hierarchy depth caps, LSH internals, simhash
properties."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from statline_bq_spark.io import read_table
from statline_bq_spark.operators import dedup, multimodal, similarity
from statline_bq_spark.operators.hierarchy import hierarchy_closure
from tests.conftest import SF_SMOKE


# --- multimodal -------------------------------------------------------------

@pytest.fixture()
def media(spark):
    return spark.createDataFrame(
        [(1, b"fake-image-bytes", "image/png", 64, 64, None),
         (2, b"other-payload", "image/jpeg", 32, 32, None),
         (3, None, "audio/wav", None, None, 5000)],
        multimodal.MEDIA_SCHEMA,
    )


def test_binary_metadata(spark, media):
    out = {r.media_id: r for r in multimodal.binary_metadata(
        media, id_col="media_id", payload_col="payload"
    ).collect()}
    assert out[1].n_bytes == len(b"fake-image-bytes")
    assert len(out[1].digest) == 64  # sha256 hex
    assert out[3].n_bytes is None    # null payload stays null
    assert out[2].bucket == 2 % 16


def test_extract_features_fake_decoder(spark, media):
    out = multimodal.extract_features(
        media, decoder=multimodal.deterministic_fake_decoder, dim=8
    )
    rows = {r.media_id: r.feature for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert len(rows[1]) == 8
    assert all(0.0 <= x <= 1.0 for x in rows[1])
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in multimodal.extract_features(
        media, decoder=multimodal.deterministic_fake_decoder, dim=8
    ).collect()}
    assert rows == again


def test_extract_features_stub_raises(spark, media):
    out = multimodal.extract_features(media, decoder=None)
    with pytest.raises(Exception, match="NotImplementedError|no media codec"):
        out.collect()


def test_frame_sample_plan(spark, media):
    plan = multimodal.frame_sample_plan(
        media.filter(F.col("duration_ms").isNotNull())
    )
    rows = [r.frame_ts_ms for r in plan.collect()]
    assert rows == [0, 1000, 2000, 3000, 4000]


# --- hierarchy --------------------------------------------------------------

def test_hierarchy_depth_cap_and_cycle_safety(spark):
    # a → b → c → a cycle: closure must terminate at max_depth
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "child string, parent string"
    )
    out = hierarchy_closure(edges, max_depth=4)
    assert out.agg(F.max("depth")).collect()[0][0] == 4
    d1 = {(r.child, r.ancestor) for r in out.filter("depth = 1").collect()}
    assert d1 == {("a", "b"), ("b", "c"), ("c", "a")}


def test_hierarchy_stops_at_fixpoint(spark):
    edges = spark.createDataFrame(
        [("leaf", "mid"), ("mid", "root")], "child string, parent string"
    )
    out = hierarchy_closure(edges, max_depth=10)
    got = {(r.child, r.ancestor, r.depth) for r in out.collect()}
    assert got == {("leaf", "mid", 1), ("mid", "root", 1), ("leaf", "root", 2)}


# --- dedup internals --------------------------------------------------------

def test_minhash_finds_planted_near_dupes(spark):
    base = read_table(spark, SF_SMOKE, "documents").limit(50)
    # plant near-duplicates: copy each doc with one token appended
    dup = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    pairs = dedup.minhash_lsh_pairs(
        base.unionByName(dup), jaccard_threshold=0.5
    ).collect()
    found = {(r.a, r.b) for r in pairs}
    # every planted pair shares almost all shingles → must be found
    planted = {(i, i + 100000) for i in [r.doc_id for r in base.collect()]}
    assert planted <= found


def test_simhash_near_for_near_texts(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "the quick brown fox jumps over the lazy dog again and again today"),
         (3, "completely different words about spark parquet shuffle joins")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(df).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(fp[1], fp[2]) < hamming(fp[1], fp[3])
    assert hamming(fp[1], fp[2]) < 16


# --- similarity internals ---------------------------------------------------

def test_lsh_ann_self_bucket_recall(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = similarity.ann_cosine_topk(emb, queries, k=1).filter("rn = 1")
    approx = similarity.lsh_bucket_topk(emb, queries, k=1, bits=4)
    # LSH with few bits keeps most near neighbors in-bucket: top-1 recall
    ex = {r.q_id: r.neighbor_id for r in exact.collect()}
    ap = {r.q_id: r.neighbor_id for r in approx.filter("rn = 1").collect()}
    recall = sum(ap.get(q) == n for q, n in ex.items()) / len(ex)
    assert recall >= 0.4  # single-table LSH, deterministic seed → stable
