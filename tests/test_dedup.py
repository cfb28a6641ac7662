"""Dedup operator invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup,
    simhash_fingerprints,
    simhash_near_dup,
)
from oracle_vector_search_spark.functions import text as T


def test_exact_dedup_collapses_doubled_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 10**6).alias("doc_id"), "text")
    )
    groups = exact_dedup(doubled).collect()
    assert len(groups) == docs.count()
    assert all(g["n_copies"] == 2 for g in groups)
    assert all(g["keep_id"] < 10**6 for g in groups)


def test_minhash_identical_docs_found(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # identical
        (3, "totally different words entirely unrelated content here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_near_dup(df, threshold=0.9).collect()
    assert {(p["left_id"], p["right_id"]) for p in pairs} == {(1, 2)}
    assert pairs[0]["jaccard"] == 1.0


def test_simhash_banding_is_lossless(spark, sf_dir):
    """Banded candidate generation must find EVERY pair with hamming ≤ 3
    (pigeonhole guarantee) — compare against brute force on a sample."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    banded = {
        (r["left_id"], r["right_id"])
        for r in simhash_near_dup(docs, max_hamming=3).collect()
    }
    fp = simhash_fingerprints(docs)
    a = fp.select(
        F.col("doc_id").alias("left_id"), F.col("simhash").alias("fa")
    )
    b = fp.select(
        F.col("doc_id").alias("right_id"), F.col("simhash").alias("fb")
    )
    brute = {
        (r["left_id"], r["right_id"])
        for r in a.join(b, F.col("left_id") < F.col("right_id"))
        .withColumn("h", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute


def test_simhash_bits_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    fps = simhash_fingerprints(docs).collect()
    assert all(0 <= r["simhash"] < (1 << T.SIMHASH_BITS) for r in fps)


def test_fixpoint_clusters_match_unrolled_and_converge(spark):
    from pyspark.sql import functions as F

    from oracle_vector_search_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_fixpoint,
    )

    # a chain 0-1-...-5 (diameter 5: the default 3-round unroll CANNOT
    # close it, the fixpoint must) plus a triangle and an isolated node
    chain = [(i, i + 1) for i in range(5)]
    tri = [(20, 21), (21, 22), (20, 22)]
    pairs = spark.createDataFrame(
        chain + tri, "left_id long, right_id long"
    )
    ids = spark.createDataFrame(
        [(i,) for i in list(range(6)) + [20, 21, 22, 30]], "doc_id long"
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        fixed = {
            r["doc_id"]: r["canonical_id"]
            for r in dedup_clusters_fixpoint(pairs, ids).collect()
        }
        unrolled = {
            r["doc_id"]: r["canonical_id"]
            for r in dedup_clusters(pairs, ids, iterations=5).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert all(fixed[i] == 0 for i in range(6))  # full chain collapsed
    assert all(fixed[i] == 20 for i in (20, 21, 22))
    assert fixed[30] == 30
    # the unrolled tier with enough iterations agrees everywhere
    assert fixed == unrolled


def test_span_grams_positions_and_short_docs(spark):
    from oracle_vector_search_spark.operators.dedup import span_grams

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # 3 bigram... with n=3: 2 grams
            (2, "x y"),          # shorter than n → no rows
            (3, "p  q   r"),     # whitespace collapses in norm
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["pos"], r["gram"])
        for r in span_grams(docs, n=3).collect()
    )
    assert rows == [
        (1, 0, "a b c"),
        (1, 1, "b c d"),
        (3, 0, "p q r"),
    ]
