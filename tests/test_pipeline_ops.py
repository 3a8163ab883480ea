"""Training-pipeline operators: dedup, similarity, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from copybook_rs_spark.operators.dedup import (
    exact_dedup,
    minhash_buckets,
    near_dup_candidates,
    simhash,
)
from copybook_rs_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
)
from copybook_rs_spark.operators.similarity import cosine_topk, lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    n = docs.count()
    uniq_texts = docs.select(F.md5("text")).distinct().count()
    deduped = exact_dedup(docs)
    assert deduped.count() == uniq_texts <= n
    # deterministic winner: rerun gives identical doc_id set
    a = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    b = {r["doc_id"] for r in exact_dedup(docs).select("doc_id").collect()}
    assert a == b


def test_minhash_finds_exact_dups(spark, docs):
    # every exact-duplicate pair must be an LSH candidate (minhash of equal
    # shingle sets is equal in every band)
    dup_pairs = (
        docs.alias("a")
        .join(docs.alias("b"), F.md5(F.col("a.text")) == F.md5(F.col("b.text")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    cands = near_dup_candidates(docs)
    missed = dup_pairs.join(cands, ["id_a", "id_b"], "left_anti").count()
    assert missed == 0
    assert cands.count() >= dup_pairs.count()


def test_minhash_buckets_shape(spark, docs):
    b = minhash_buckets(docs, n_seeds=8, band_size=4)
    n = docs.count()
    assert b.count() == 2 * n  # 2 bands per doc
    assert b.select("band_idx").distinct().count() == 2


def test_simhash_dedup(spark, docs):
    fp = simhash(docs)
    rows = fp.collect()
    assert len(rows) == docs.count()
    # identical texts -> identical simhash
    joined = (
        docs.join(fp, "doc_id")
        .groupBy(F.md5("text"))
        .agg(F.countDistinct("simhash").alias("d"))
    )
    assert joined.agg(F.max("d")).collect()[0][0] == 1


def test_cosine_topk_self_first(spark, emb):
    q = emb.orderBy("vec_id").limit(1).collect()[0]
    top = cosine_topk(emb, list(q["embedding"]), k=5).collect()
    assert top[0]["vec_id"] == q["vec_id"]  # self-similarity 1.0 first
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-3
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_contains_self_and_subset_of_bucket(spark, emb):
    q = emb.orderBy("vec_id").limit(1).collect()[0]
    top = lsh_topk(emb, list(q["embedding"]), k=5).collect()
    assert len(top) >= 1
    assert top[0]["vec_id"] == q["vec_id"]  # query's own bucket contains it
    # ANN results are a subset of the exact brute-force ranking's universe
    exact = {r["vec_id"] for r in cosine_topk(emb, list(q["embedding"]), k=500).collect()}
    assert all(r["vec_id"] in exact for r in top)


def test_multimodal_features_deterministic(spark, docs):
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
        F.lit("image").alias("kind"),
        F.lit(640).alias("width"),
        F.lit(480).alias("height"),
    )
    f1 = extract_features(media).collect()
    f2 = extract_features(media).collect()
    assert len(f1) == docs.count()
    m1 = {r["media_id"]: r["features"] for r in f1}
    m2 = {r["media_id"]: r["features"] for r in f2}
    assert m1 == m2  # deterministic
    assert all(len(v) == FEATURE_DIM for v in m1.values())
    # n_bytes matches the utf-8 length
    lens = {r["media_id"]: r["n_bytes"] for r in f1}
    for r in docs.select("doc_id", F.length(F.encode("text", "utf-8")).alias("n")).collect():
        assert lens[r["doc_id"]] == r["n"]


def test_decode_media_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...", "image")
