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
