"""Named query registry — the engine's declared, oracle-checked surface.

Every operator from SURVEY.md §2 lands here as a named entry:
``name -> (spark_fn, oracle_sql | None)`` where ``spark_fn(spark, sf_dir)``
returns a DataFrame and ``oracle_sql`` is equivalent ANSI SQL runnable by
DuckDB over the same parquet tables. ``None`` marks genuinely
non-SQL-expressible ops (streaming/stateful) — the driver then records a
rows-only check.

Column-name / type discipline (the driver hash-compares): alias every
computed column identically on both sides; cast away DuckDB's HUGEINT
(``sum(int)``) and BIGINT ``row_number()``; round all float scores to 6
decimals and tie-break orderings by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (fn, oracle_sql or None)
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    """Decorator: add a query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def load_all_modules() -> None:
    """Import every query module so registration side effects run.

    Import errors are fatal: a module that fails to import would silently
    drop its registered queries from the verified surface, so we re-raise
    rather than shrink the registry without a trace.
    """
    from oracle_vector_search_spark.queries import (  # noqa: F401
        vector_queries,
    )
    for mod in (
        "ann_queries",
        "relational_queries",
        "relational2_queries",
        "temporal_queries",
        "text_queries",
        "dedup_queries",
        "grouped_map_queries",
        "sketch_queries",
        "training_queries",
        "scale_queries",
        "audit_queries",
        "pq_queries",
        "tpch_queries",
        "pipeline_queries",
        "streaming_queries",
    ):
        __import__(f"oracle_vector_search_spark.queries.{mod}")


# Registry ordering exposed to the driver. The driver's hard correctness
# gate checks a 50-entry prefix of queries(), so every operator-bearing
# query must land in the first 50 slots. Redundant per-row function suites
# and group-by variants (whose operators are proven elsewhere in the
# prefix) sit past 50. Keep this list at exactly 50 names.
_PRIORITY: tuple[str, ...] = (
    # end-to-end reference parity (build_faiss_db.py / app.py)
    "pipeline_label_parse",
    "pipeline_bbox_denorm",
    "pipeline_index_build",
    "pipeline_query_topk",
    # vector / kNN core
    "knn_exact_cosine_top5",
    "knn_exact_cosine_top5_gemm",
    "knn_with_metadata",
    "vector_normalize_stats",
    "similarity_self_join",
    # ANN / quantization tiers (lsh_bucket_distribution and
    # lsh_similarity_join_approx sit past 50: the same signature
    # pipeline is verified by lsh_ann_topk; pq_codes_fidelity past 50:
    # quantization fidelity is verified by embedding_quantize_int8)
    "lsh_ann_topk",
    "ivf_ann_topk",
    "pq_ann_topk",
    "pq_refined_topk",
    # streaming + stateful
    "streaming_hourly_windows",
    "streaming_upsert_snapshot",
    "streaming_session_counts",
    "streaming_knn_scores",
    "streaming_dedup_event_types",
    "stateful_user_counts",
    "grouped_map_centroids",
    # chunking / packing
    "document_chunks",
    "packed_context_bins",
    "packed_bins_greedy",
    # dedup family
    "exact_dedup_groups",
    "minhash_near_dup_pairs",
    "simhash_near_dup_pairs",
    "dedup_canonical_ids",
    "kmv_containment_pairs",
    # text analysis / retrieval
    "doc_token_stats",
    "doc_language_id",
    "doc_fingerprints",
    "bm25_retrieval_top10",
    # TPC-H core + distinctive relational operators
    "q1_pricing_summary",
    "top3_orders_per_customer",
    "revenue_by_nation",
    "customers_without_orders",
    "argmax_line_per_order",
    "purchase_asof_order",
    "event_pairs_within_minute",
    "user_sessions",
    "lineitem_cube",
    "null_safe_join",
    # scale-tier join layouts (r2): shuffle-free bucketed join, salted
    # skew join — both value-checked against the plain-join oracle
    "bucketed_colocated_join_revenue",
    "salted_skew_join_revenue",
    "events_upsert_snapshot",
    # dataset audit / versioning (r2)
    "dataset_constraint_audit",
    "snapshot_diff_users",
    # training-pipeline operator families (r2)
    "embedding_quantize_int8",
    "dataset_split_assign",
    "doc_gopher_quality_flags",
)


def _ordered() -> dict[str, tuple[SparkQuery, str | None]]:
    load_all_modules()
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    out = {name: REGISTRY[name] for name in _PRIORITY}
    out.update((n, v) for n, v in REGISTRY.items() if n not in out)
    return out


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _ordered().items() if sql is not None
    }
