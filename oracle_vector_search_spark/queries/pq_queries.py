"""Product-quantization oracle corpus (operators.quantize).

Both the encoding (codes per subspace) and the PQ search (asymmetric
scoring against reconstructions) hash-match DuckDB because the
codebooks are deterministic hash-derived literals and every distance
sum uses the same left-assoc fold on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from oracle_vector_search_spark.functions.vector import cosine_similarity
from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators import quantize as Q
from oracle_vector_search_spark.queries import register

_CODE_COLS = [f"code{s}" for s in range(Q.PQ_SUBSPACES)]


def _duck_coded_cte(source_sql: str) -> str:
    code_exprs = ", ".join(
        f"{Q.duck_code_sql('e', s)} AS code{s}"
        for s in range(Q.PQ_SUBSPACES)
    )
    recon = Q.duck_recon_sql(_CODE_COLS)
    return f"""
v AS ({source_sql}),
coded AS (SELECT vec_id, e, {code_exprs} FROM v),
recon AS (SELECT vec_id, e, {', '.join(_CODE_COLS)}, {recon} AS recon
          FROM coded)"""


_DUCK_COS = (
    "round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))), 6)"
)


@register(
    "pq_codes_fidelity",
    f"""
WITH {_duck_coded_cte("SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings")}
SELECT vec_id, {', '.join(_CODE_COLS)},
       {_DUCK_COS.format(a='e', b='recon')} AS recon_cosine
FROM recon
""",
)
def pq_codes_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode every vector (8 subspaces × 16 centroids → 8 codes;
    64 doubles become 8 bytes at rest) and report the reconstruction
    cosine per vector — the compression-loss audit. Pure per-row
    projection; at 100 TB the codes table IS the index payload."""
    emb = load_table(spark, sf_dir, "embeddings")
    coded = Q.pq_encode(emb)
    return coded.select(
        "vec_id",
        *_CODE_COLS,
        F.round(cosine_similarity("e", "recon"), 6).alias("recon_cosine"),
    )


@register(
    "pq_ann_topk",
    f"""
WITH {_duck_coded_cte("SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings")},
q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         {_DUCK_COS.format(a='q.qv', b='r.recon')} AS score
  FROM recon r CROSS JOIN q
)
SELECT query_id, neighbor_id, score, CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
      FROM scored)
WHERE rn <= 5
""",
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search: exact query vectors scored against the index
    RECONSTRUCTIONS (asymmetric distance computation) — the same
    broadcast-query/stream-index plan as exact kNN with the index 64x
    smaller. Recall vs exact kNN is property-tested; the scoring
    itself is oracle-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    recon = Q.pq_encode(emb).select(
        F.col("vec_id").alias("neighbor_id"), "recon"
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    scored = recon.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity("qv", "recon"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


@register(
    "pq_refined_topk",
    f"""
WITH {_duck_coded_cte("SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings")},
q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 10),
pq_scored AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         {_DUCK_COS.format(a='q.qv', b='r.recon')} AS pq_score
  FROM recon r CROSS JOIN q
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY pq_score DESC, neighbor_id) AS rn
    FROM pq_scored
  ) WHERE rn <= 20
),
refined AS (
  SELECT c.query_id, c.neighbor_id,
         {_DUCK_COS.format(a='q.qv', b='d.e')} AS score
  FROM cand c
  JOIN v d ON d.vec_id = c.neighbor_id
  JOIN q ON q.query_id = c.query_id
)
SELECT query_id, neighbor_id, score, CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
      FROM refined)
WHERE rn <= 5
""",
)
def pq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the standard large-index serving shape:
    stage 1 scores the 64x-smaller PQ reconstructions and keeps 20
    candidates per query; stage 2 rescores ONLY those candidates
    against the exact vectors (a 20-rows-per-query semi-join — the
    full-precision index is touched for 20/N of its rows) and emits
    the exact-scored top-5. At 100 TB stage 1 reads the codes table,
    stage 2 does point lookups into the full vectors — this query is
    why the codes table exists.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    recon = Q.pq_encode(emb).select(
        F.col("vec_id").alias("neighbor_id"), "recon"
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("pq_score"), F.asc("neighbor_id")
    )
    cand = (
        recon.join(F.broadcast(q))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("qv", "recon"), 6).alias("pq_score"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("query_id", "neighbor_id")
    )
    exact_vecs = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("ev"),
    )
    refined = (
        cand.join(exact_vecs, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("qv", "ev"), 6).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 5)
    )
