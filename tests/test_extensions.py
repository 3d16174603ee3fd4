"""Extension operator invariants (dedup / similarity / text / multimodal)."""

import pytest
from pyspark.sql import functions as F

from crypto_market_data_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_jaccard_pairs,
    simhash,
    word_shingles,
)
from crypto_market_data_etl_spark.operators.multimodal import (
    extract_features,
    to_blob_table,
)
from crypto_market_data_etl_spark.operators.similarity import cosine_topk, lsh_buckets
from crypto_market_data_etl_spark.schemas import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").limit(100).cache()


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings").limit(200).cache()


def test_exact_dedup_counts_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa")], "doc_id long, text string"
    )
    out = {r.content_hash: r for r in exact_dedup(df, ["text"], "doc_id").collect()}
    assert len(out) == 2
    dup = [r for r in out.values() if r.n_copies == 2][0]
    assert dup.keep_id == 1


def test_minhash_self_duplicate_detected(spark, docs):
    # append an exact copy of one doc under a new id: jaccard_est must be 1.0
    one = docs.filter(F.col("doc_id") == 1).withColumn("doc_id", F.lit(999_999).cast("long"))
    pairs = minhash_jaccard_pairs(docs.unionByName(one)).collect()
    exact = [p for p in pairs if p.doc_a == 1 and p.doc_b == 999_999]
    assert len(exact) == 1 and exact[0].jaccard_est == 1.0
    assert all(0.0 <= p.jaccard_est <= 1.0 and p.doc_a < p.doc_b for p in pairs)


def test_simhash_shape_and_determinism(spark, docs):
    out = simhash(docs).collect()
    assert all(len(r.simhash) == 32 and set(r.simhash) <= {"0", "1"} for r in out)
    again = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert all(again[r.doc_id] == r.simhash for r in out)


def test_shingles_distinct(spark, docs):
    sh = word_shingles(docs)
    assert sh.count() == sh.distinct().count()


def test_cosine_topk_self_similarity_excluded(spark, embs):
    out = cosine_topk(embs, embs.filter(F.col("vec_id") < 3), k=4).collect()
    assert all(r.q_id != r.n_id for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rnk)
        sims = [r.sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)


def test_cosine_topk_finds_identical_vector(spark, embs):
    clone = embs.filter(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(777_777).cast("long")
    )
    out = cosine_topk(embs.unionByName(clone), embs.filter(F.col("vec_id") == 0), k=1).collect()
    assert out[0].n_id == 777_777 and abs(out[0].sim - 1.0) < 1e-6


def test_cosine_topk_np_matches_expression_tier(spark, embs):
    from crypto_market_data_etl_spark.operators.similarity import cosine_topk_np

    qs = embs.filter(F.col("vec_id") < 5)
    a = {(r.q_id, r.rnk): r.n_id for r in cosine_topk(embs, qs, k=4).collect()}
    b = {(r.q_id, r.rnk): r.n_id for r in cosine_topk_np(embs, qs, k=4).collect()}
    assert a == b


def test_ivf_numpy_assign_matches_expression_tier(spark, embs):
    from crypto_market_data_etl_spark.operators.similarity import ivf_ann_topk

    qs = embs.filter(F.col("vec_id") % 50 == 0)
    flt = F.col("vec_id") % 20 == 1
    a = {(r.q_id, r.rnk): r.n_id
         for r in ivf_ann_topk(embs, qs, n_probe=2, k=3, centroid_filter=flt).collect()}
    b = {(r.q_id, r.rnk): r.n_id
         for r in ivf_ann_topk(embs, qs, n_probe=2, k=3, centroid_filter=flt,
                               numpy_assign=True).collect()}
    assert a == b


def test_lsh_buckets_shape(spark, embs):
    out = lsh_buckets(embs).collect()
    assert all(len(r.bucket) == 16 and set(r.bucket) <= {"0", "1"} for r in out)
    # identical vectors share a bucket
    sizes = {}
    for r in out:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert all(r.n_in_bucket == sizes[r.bucket] for r in out)


def test_multimodal_features_deterministic(spark, docs):
    blobs = to_blob_table(docs.limit(10))
    a = {r.doc_id: r.feature for r in extract_features(blobs).collect()}
    b = {r.doc_id: r.feature for r in extract_features(blobs).collect()}
    assert a == b
    assert all(len(v) == 8 and all(0 <= x <= 1 for x in v) for v in a.values())


def test_multimodal_real_decode_raises(spark, docs):
    with pytest.raises(NotImplementedError):
        extract_features(to_blob_table(docs), real_decode=True)
