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


def test_gemm_guards_large_query_sets(spark, sf_dir):
    import pytest

    emb, q = _topk_frames(spark, sf_dir)
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        knn_exact_gemm(emb, q, k=5, max_queries=3)


def test_gemm_tie_break_survives_batch_boundary(spark):
    # many index vectors identical up to < 1e-6 — scores tie only AFTER
    # rounding; both tiers must keep the lowest neighbor_ids, even when
    # ties straddle mapInPandas batch boundaries
    rows = [(i, [1.0, 1.0 + i * 1e-12]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 1.0])],
                              "vec_id long, embedding array<double>")
    a = _as_set(knn_exact(emb, q, k=5))
    b = _as_set(knn_exact_gemm(emb.repartition(8), q, k=5))
    assert a == b
    assert {r[1] for r in b} == {0, 1, 2, 3, 4}  # id tie-break, not float luck


def test_gemm_zero_norm_scores_null_like_expression_tier(spark):
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(9, [1.0, 1.0])],
                              "vec_id long, embedding array<double>")
    a = sorted((r["neighbor_id"], r["score"])
               for r in knn_exact(emb, q, k=3).collect())
    b = sorted((r["neighbor_id"], r["score"])
               for r in knn_exact_gemm(emb, q, k=3).collect())
    assert a == b
    assert dict(a)[0] is None  # zero-norm vector scores NULL, ranks last


# --------------------------------------------------------- tier dispatch

def test_choose_knn_tier_rules():
    from oracle_vector_search_spark.operators.knn import (
        EXPR_MAX_QUERIES,
        GEMM_MAX_QUERIES,
        choose_knn_tier,
    )

    assert choose_knn_tier(1) == "expr"
    assert choose_knn_tier(EXPR_MAX_QUERIES) == "expr"
    assert choose_knn_tier(EXPR_MAX_QUERIES + 1) == "gemm"
    assert choose_knn_tier(100, has_int8_codes=True) == "gemm_int8"
    # approximate tiers are never auto-selected: beyond the GEMM cap the
    # dispatcher falls back to the (collect-free) expression tier
    assert choose_knn_tier(GEMM_MAX_QUERIES + 1) == "expr"
    assert choose_knn_tier(GEMM_MAX_QUERIES + 1, has_int8_codes=True) == "expr"
    # explicit tier always wins
    assert choose_knn_tier(1, tier="gemm") == "gemm"


def test_knn_search_tiers_agree(spark, sf_dir):
    """Every dispatched tier must return identical (query, neighbor,
    score, rank) rows — the tier is physical, never semantic."""
    from oracle_vector_search_spark.operators.knn import (
        knn_search,
        quantize_unit_int8,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)

    def canon(df):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["score"])
            for r in df.collect()
        )

    expr = canon(knn_search(emb, q, k=5, tier="expr"))
    gemm = canon(knn_search(emb, q, k=5, tier="gemm"))
    codes = quantize_unit_int8(emb)
    i8 = canon(knn_search(emb, q, k=5, tier="gemm_int8", codes=codes))
    auto = canon(knn_search(emb, q, k=5))  # Q=3 → expr
    assert expr == gemm == i8 == auto


def test_knn_search_auto_expr_has_no_python_stage(spark, sf_dir):
    """Q ≤ EXPR_MAX_QUERIES auto-routes to the expression tier: the
    chosen plan must be pure Catalyst (no mapInPandas stage)."""
    from oracle_vector_search_spark.operators.knn import knn_search

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2)
    plan = (
        knn_search(emb, q, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan
