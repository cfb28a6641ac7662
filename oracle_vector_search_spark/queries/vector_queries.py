"""Flagship vector queries — the reference's core semantics as Spark ops.

Covers SURVEY.md §2.6 A2 (top-k by similarity), §2.7 M1/M2/M3 (dot,
normalize, float policy), §2.5 J2 (result⋈metadata join), §2.3 T13 (rank).
Reference behavior: L2-normalize + IndexFlatIP top-5 cosine
(/root/reference/build_faiss_db.py:216-218, /root/reference/app.py:139-151).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.functions.vector import (
    as_double_array,
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
from oracle_vector_search_spark.operators.knn import (
    knn_exact,
    knn_exact_gemm,
    knn_join_metadata,
    similarity_join,
)
from oracle_vector_search_spark.queries import register

N_QUERIES = 10  # first N vec_ids serve as the query set (FIXTURES.md)
K = 5  # the reference's fixed k (app.py:142)

_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v
  FROM embeddings
), scored AS (
  SELECT q.query_id, d.neighbor_id,
         round(
           list_dot_product(q.v, d.v)
           / (sqrt(list_dot_product(q.v, q.v))
              * sqrt(list_dot_product(d.v, d.v))), 6) AS score
  FROM d CROSS JOIN q
), ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, neighbor_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= {K}
"""


@register("knn_exact_cosine_top5", _KNN_ORACLE)
def q_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5, expression tier (broadcast cross join + window)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return knn_exact(emb, queries, k=K)


@register("knn_exact_cosine_top5_gemm", _KNN_ORACLE)
def q_knn_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics via the BLAS fast path (mapInPandas GEMM + merge)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return knn_exact_gemm(emb, queries, k=K)


@register(
    "knn_with_metadata",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v
  FROM embeddings
), scored AS (
  SELECT q.query_id, d.neighbor_id,
         round(
           list_dot_product(q.v, d.v)
           / (sqrt(list_dot_product(q.v, q.v))
              * sqrt(list_dot_product(d.v, d.v))), 6) AS score
  FROM d CROSS JOIN q
), ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, neighbor_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT r.query_id, r.neighbor_id, r.score, r.rank, e.label AS neighbor_label
FROM ranked r JOIN embeddings e ON e.vec_id = r.neighbor_id
WHERE r.rank <= {K}
""",
)
def q_knn_with_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k decorated with index metadata — the reference's positional
    metadata lookup (app.py:149-153) as an explicit broadcast join (J2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    topk = knn_exact(emb, queries, k=K)
    meta = emb.select("vec_id", F.col("label").alias("neighbor_label"))
    return knn_join_metadata(topk, meta).select(
        "query_id", "neighbor_id", "score", "rank", "neighbor_label"
    )


@register(
    "vector_normalize_stats",
    """
SELECT vec_id,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
         AS norm,
       round(list_dot_product(
           [x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
            for x in embedding::DOUBLE[]],
           [x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
            for x in embedding::DOUBLE[]]), 6) AS unit_dot
FROM embeddings
WHERE vec_id < 100
""",
)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize invariant: ‖v‖ reported, and v̂·v̂ = 1 (M2/T10)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = as_double_array("embedding")
    unit = l2_normalize(v)
    return emb.select(
        "vec_id",
        F.round(l2_norm(v), 6).alias("norm"),
        F.round(dot(unit, unit), 6).alias("unit_dot"),
    )


@register(
    "similarity_self_join",
    """
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 10 = 0
)
SELECT a.vec_id AS left_id, b.vec_id AS right_id,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS score
FROM d a JOIN d b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
""",
)
def q_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine similarity self-join (threshold 0.3) on a 1/10th
    sample — the quadratic oracle baseline for the LSH-pruned version."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 10 == 0
    )
    return similarity_join(emb, emb, threshold=0.3)


@register(
    "knn_label_purity",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT vec_id AS neighbor_id, label AS neighbor_label,
         embedding::DOUBLE[] AS v
  FROM embeddings
), scored AS (
  SELECT q.query_id, q.query_label, d.neighbor_id, d.neighbor_label,
         round(list_dot_product(q.v, d.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(d.v, d.v))), 6) AS score
  FROM d CROSS JOIN q
  WHERE d.neighbor_id <> q.query_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id,
       CAST(sum(CASE WHEN neighbor_label = query_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_same_label,
       round(avg(score), 6) AS avg_score
FROM ranked WHERE rn <= {K}
GROUP BY query_id
""",
)
def q_knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query label purity of the top-5 (self excluded) — an
    aggregate consumer of the kNN operator (classification-style eval,
    the reference's class-decode path J3/T12 generalized)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        as_double_array("embedding").alias("q_vec"),
    )
    v = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        as_double_array("embedding").alias("v_vec"),
    )
    scored = (
        v.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            F.round(cosine_similarity("q_vec", "v_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("neighbor_label") == F.col("query_label"), 1
                ).otherwise(0)
            ).alias("n_same_label"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
    )


@register(
    "embedding_dim_stats",
    """
WITH d AS (
  SELECT vec_id,
         unnest([{'dim': i - 1,
                  'q': CAST(floor(embedding[i] * 1000000.0::DOUBLE)
                            AS BIGINT)}
                 FOR i IN range(1, len(embedding) + 1)]) AS u
  FROM (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings)
),
m AS (
  SELECT u.dim AS dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(u.q) AS BIGINT) AS s1,
         CAST(sum(u.q * u.q) AS BIGINT) AS s2
  FROM d GROUP BY u.dim
)
SELECT dim, n,
       round(CAST(s1 AS DOUBLE) / n / 1000000.0, 6) AS mean,
       round(sqrt(greatest(
         CAST(s2 AS DOUBLE) / n
         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
         0.0)) / 1000000.0, 6) AS std
FROM m
ORDER BY dim
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding telemetry (mean / std) — the drift audit
    an embedding pipeline runs when the model or corpus changes (a
    collapsed or shifted dimension shows up immediately). Moments
    accumulate as EXACT integers (floor(x·1e6), the engine's standard
    determinism trick), so the shuffle is order-independent and the one
    final double formula hash-matches across engines. One posexplode +
    one partial-agg shuffle on (dim); 64 output rows regardless of
    corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(cast(embedding as array<double>), "
                "x -> cast(floor(x * 1000000.0D) as bigint))"
            )
        ).alias("dim", "q"),
    )
    m = d.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    n = F.col("n")
    return m.select(
        "dim",
        "n",
        F.round(s1d / n / 1000000.0, 6).alias("mean"),
        F.round(
            F.sqrt(
                F.greatest(
                    s2d / n - (s1d / n) * (s1d / n), F.lit(0.0)
                )
            )
            / 1000000.0,
            6,
        ).alias("std"),
    ).orderBy("dim")


@register(
    "embedding_drift_audit",
    """
WITH halves AS (
  SELECT vec_id, vec_id % 2 = 0 AS is_base, embedding::DOUBLE[] AS v
  FROM embeddings
),
comps AS (
  SELECT is_base, generate_subscripts(v, 1) AS dim,
         CAST(floor(unnest(v) * 1000000) AS BIGINT) AS micro
  FROM halves
),
stats AS (
  SELECT dim,
         CAST(sum(CASE WHEN is_base THEN micro ELSE 0 END) AS BIGINT)
           AS base_sum,
         CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT)
           AS base_n,
         CAST(sum(CASE WHEN is_base THEN 0 ELSE micro END) AS BIGINT)
           AS cur_sum,
         CAST(sum(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
  FROM comps GROUP BY dim
),
drift AS (
  SELECT CAST(dim AS INTEGER) AS dim,
         round(base_sum * 1.0 / base_n / 1000000, 6) AS base_mean,
         round(cur_sum * 1.0 / cur_n / 1000000, 6) AS cur_mean,
         round(abs(cur_sum * 1.0 / cur_n - base_sum * 1.0 / base_n)
               / 1000000, 6) AS abs_shift
  FROM stats
)
SELECT dim, base_mean, cur_mean, abs_shift, CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY abs_shift DESC, dim) AS rn
      FROM drift)
WHERE rn <= 10
""",
)
def embedding_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding distribution drift between two index snapshots (vec_id
    parity stands in for yesterday/today): per-dimension means from
    EXACT integer micro-unit sums (float components floored to 1e-6
    units before summation, so partial-agg order can never move a
    mean), ranked by absolute shift — the nightly audit that catches a
    silently retrained or corrupted embedder before it poisons
    retrieval. Top-10 drifting dimensions with engine-exact shift
    values.

    Shape at 100 TB: posexplode rides the scan, one groupBy(dim) with
    map-side partial aggregation — 64 output rows regardless of corpus
    size."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2 == 0).alias("is_base"),
        F.posexplode(as_double_array("embedding")).alias("dim0", "comp"),
    )
    comps = emb.select(
        "is_base",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("comp") * 1000000).cast("long").alias("micro"),
    )
    stats = comps.groupBy("dim").agg(
        F.sum(F.when(F.col("is_base"), F.col("micro")).otherwise(0)).alias(
            "base_sum"
        ),
        F.sum(F.col("is_base").cast("long")).alias("base_n"),
        F.sum(
            F.when(~F.col("is_base"), F.col("micro")).otherwise(0)
        ).alias("cur_sum"),
        F.sum((~F.col("is_base")).cast("long")).alias("cur_n"),
    )
    base_mean = F.col("base_sum") * 1.0 / F.col("base_n")
    cur_mean = F.col("cur_sum") * 1.0 / F.col("cur_n")
    drift = stats.select(
        F.col("dim").cast("int").alias("dim"),
        F.round(base_mean / 1000000, 6).alias("base_mean"),
        F.round(cur_mean / 1000000, 6).alias("cur_mean"),
        F.round(F.abs(cur_mean - base_mean) / 1000000, 6).alias(
            "abs_shift"
        ),
    )
    from oracle_vector_search_spark.operators.topk import global_topn_ranked

    return global_topn_ranked(
        drift, 10, F.desc("abs_shift"), F.asc("dim")
    ).select("dim", "base_mean", "cur_mean", "abs_shift", "rank")
