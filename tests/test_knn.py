"""kNN operator invariants (SURVEY.md §5.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.knn import (
    knn_exact,
    knn_exact_gemm,
    similarity_join,
)


def _topk_frames(spark, sf_dir, k=5):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return emb, q


def _as_set(df):
    return {
        (r["query_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in df.collect()
    }


def test_expr_and_gemm_tiers_agree(spark, sf_dir):
    emb, q = _topk_frames(spark, sf_dir)
    a = _as_set(knn_exact(emb, q, k=5))
    b = _as_set(knn_exact_gemm(emb, q, k=5))
    assert a == b
    assert len(a) == 10 * 5


def test_topk_invariant_under_partitioning(spark, sf_dir):
    emb, q = _topk_frames(spark, sf_dir)
    a = _as_set(knn_exact(emb, q, k=5))
    b = _as_set(knn_exact(emb.repartition(13), q, k=5))
    c = _as_set(knn_exact_gemm(emb.repartition(7), q, k=5))
    assert a == b == c


def test_self_is_top1(spark, sf_dir):
    emb, q = _topk_frames(spark, sf_dir)
    top1 = knn_exact(emb, q, k=1).collect()
    for r in top1:
        assert r["neighbor_id"] == r["query_id"]
        assert abs(r["score"] - 1.0) < 1e-6


def test_rank_dense_and_bounded(spark, sf_dir):
    emb, q = _topk_frames(spark, sf_dir)
    df = knn_exact(emb, q, k=5)
    per_q = (
        df.groupBy("query_id")
        .agg(F.count("*").alias("n"), F.collect_set("rank").alias("ranks"))
        .collect()
    )
    for r in per_q:
        assert r["n"] == 5
        assert sorted(r["ranks"]) == [1, 2, 3, 4, 5]


def test_similarity_join_is_symmetric_dedup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 100
    )
    pairs = similarity_join(emb, emb, threshold=0.0).collect()
    seen = {(r["left_id"], r["right_id"]) for r in pairs}
    for l, r in seen:
        assert l < r
        assert (r, l) not in seen
