"""ANN operator properties: recall vs exact, MLlib wrapper sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.ann import (
    lsh_ann_topk,
    lsh_bucket_table,
    lsh_similarity_join,
    mllib_brp_lsh_join,
)
from oracle_vector_search_spark.operators.knn import knn_exact, similarity_join

DIMS = 64


def test_lsh_topk_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_exact(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_ann_topk(emb, q, k=5, dims=DIMS).collect()
    }
    recall = len(exact & approx) / len(exact)
    # self-match always shares every bucket, and near neighbors usually
    # share one of 4 bands; require a sane floor on this fixture
    assert recall >= 0.5, f"recall@5 too low: {recall}"


def test_lsh_join_is_subset_of_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 10 == 0
    )
    exact = {
        (r["left_id"], r["right_id"])
        for r in similarity_join(emb, emb, threshold=0.3).collect()
    }
    approx = {
        (r["left_id"], r["right_id"])
        for r in lsh_similarity_join(emb, threshold=0.3, dims=DIMS).collect()
    }
    assert approx <= exact  # LSH candidates verified exactly → no false pos


def test_bucket_table_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    buckets = lsh_bucket_table(emb, dims=DIMS)
    assert buckets.count() == 4 * n  # one row per band
    rng = buckets.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).first()
    assert 0 <= rng["lo"] and rng["hi"] <= 15  # 4-bit bucket keys


def test_mllib_brp_lsh_matches_cosine_ordering(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 100
    )
    pairs = mllib_brp_lsh_join(
        emb, threshold_euclidean=1.2, num_hash_tables=8
    ).collect()
    assert pairs, "MLlib LSH join returned nothing"
    # d^2 = 2 - 2cos on unit vectors → euclidean < 1.2 ⇒ cos > 0.28
    exact = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in similarity_join(emb, emb, threshold=-1.0).collect()
    }
    for p in pairs:
        cos = exact[(p["left_id"], p["right_id"])]
        assert cos > 0.27, (p, cos)


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    from oracle_vector_search_spark.operators.ann import ivf_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_exact(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, q, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall@5 too low: {recall}"
    # every query must at least find itself (its own cluster is probed)
    for qid in {p[0] for p in exact}:
        assert (qid, qid) in approx
