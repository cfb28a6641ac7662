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


def test_bucket_table_at_rest_prunes_band_partitions(spark, sf_dir):
    """The materialized LSH bucket table is partitioned by band; a
    band-scoped scan must hit the partition filter (metadata-level
    pruning), not a post-scan filter — the 100 TB read path."""
    from pyspark.sql import functions as F

    from oracle_vector_search_spark.queries.ann_queries import _bucket_table

    bt = _bucket_table(spark, sf_dir)
    one_band = bt.filter(F.col("band") == 2)
    plan = one_band._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(band" in plan, plan
    # pruned read returns exactly the band's rows (1 row per vector)
    n_vectors = bt.select("vec_id").distinct().count()
    assert one_band.count() == n_vectors


def test_pq_recall_and_fidelity(spark, sf_dir):
    """PQ reconstructions keep cosine fidelity positive and PQ top-5
    overlaps exact top-5 (recall floor — random codebooks are crude,
    but ADC ranking must still correlate with exact ranking)."""
    from pyspark.sql import functions as F

    from oracle_vector_search_spark.io import load_table
    from oracle_vector_search_spark.operators.knn import knn_exact
    from oracle_vector_search_spark.queries.pq_queries import (
        pq_ann_topk,
        pq_codes_fidelity,
    )

    fid = pq_codes_fidelity(spark, sf_dir).agg(
        F.min("recon_cosine").alias("mn"), F.avg("recon_cosine").alias("av")
    ).collect()[0]
    assert fid["av"] > 0.2  # hash codebooks: crude but aligned on average
    codes = pq_codes_fidelity(spark, sf_dir).select("code0").distinct()
    assert codes.count() > 1  # codes actually discriminate

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_exact(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_ann_topk(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, recall  # floor, not a tuning claim


def test_multiprobe_expands_to_hamming_one(spark):
    """Each (band, bucket) expands to itself + ROWS_PER_BAND flipped-bit
    buckets, distinct."""
    from oracle_vector_search_spark.operators.ann import (
        ROWS_PER_BAND,
        multiprobe_query_buckets,
    )

    qb = spark.createDataFrame(
        [(1, 0, 5), (1, 1, 0)], "vec_id long, band int, bucket int"
    )
    rows = {
        (r["band"], r["bucket"])
        for r in multiprobe_query_buckets(qb).collect()
    }
    assert (0, 5) in rows and (1, 0) in rows
    expect0 = {(0, 5 ^ (1 << r)) for r in range(ROWS_PER_BAND)} | {(0, 5)}
    expect1 = {(1, 0 ^ (1 << r)) for r in range(ROWS_PER_BAND)} | {(1, 0)}
    assert rows == expect0 | expect1


def test_ivf_closure_assign_properties(spark, sf_dir):
    """Closure assignment is a superset of single assignment, each
    vector appears at most n_assign times, and every vector's single
    cluster is among its closure clusters."""
    from oracle_vector_search_spark.operators.ann import (
        ivf_assign,
        ivf_closure_assign,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    single = {
        (r["vec_id"], r["cluster_id"])
        for r in ivf_assign(emb).collect()
    }
    closure_rows = ivf_closure_assign(emb, n_assign=2).collect()
    closure = {(r["vec_id"], r["cluster_id"]) for r in closure_rows}
    assert single <= closure
    n_vecs = emb.count()
    assert len(closure_rows) <= 2 * n_vecs
    # replication actually happens (boundary vectors exist)
    assert len(closure_rows) > n_vecs


def test_closure_recall_dominates_single(spark, sf_dir):
    from oracle_vector_search_spark.queries.ann_queries import (
        ivf_closure_recall_audit,
    )

    rows = ivf_closure_recall_audit(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["closure_hits"] >= r["single_hits"]
