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
        "feature_queries",
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
# gate checks a 50-entry prefix of queries(), so the prefix ROTATES each
# round to spread verification across the whole registry:
#   r1 window ∪ r2 window = 79 distinct driver-checked queries;
#   r3 (this file) = 8 always-on sentinels + the 36 queries never checked
#   in any prior round + new round-3 queries. After r3 the union covers
#   the entire registry. Queries past position 49 remain verified by the
#   local gate (tools/oracle_check.py, full surface, CI via
#   tests/test_full_surface.py). Keep this list at exactly 50 names.
_PRIORITY: tuple[str, ...] = (
    # --- sentinels: always driver-checked in every round ---
    "pipeline_label_parse",
    "pipeline_bbox_denorm",
    "pipeline_index_build",
    "pipeline_query_topk",
    "knn_exact_cosine_top5",
    "knn_exact_cosine_top5_gemm",
    "exact_dedup_groups",
    "streaming_upsert_snapshot",
    # --- never driver-checked before round 3: retrieval family ---
    "term_doc_frequency_top20",
    "boolean_and_retrieval_top20",
    "phrase_retrieval_top20",
    "bigram_collocations_top20",
    "mmr_rerank_top3",
    "chunk_embed_retrieve_topk",
    # --- never-checked: ANN / clustering audits ---
    "pq_codes_fidelity",
    "kmeans_refine_clusters",
    "ngram_jaccard_pairs",
    "fuzzy_entity_match_pairs",
    # --- never-checked: ML-prep / training pipeline ---
    "target_encode_loo",
    "contrastive_negative_samples",
    "hard_negative_mining_top3",
    "stratified_sample_rates",
    "feature_correlation_exact",
    "winsorized_price_stats",
    # --- never-checked: text analysis ---
    "doc_pii_scrub",
    "doc_repetition_stats",
    # --- never-checked: temporal / CDC / streaming ---
    "events_hourly_gapfill_locf",
    "hourly_agg_partial_merge",
    "view_purchase_funnel",
    "streaming_view_purchase_pairs",
    "streaming_sliding_windows_watermark",
    "q6_forecast_revenue",
    # --- never-checked: relational / join / window shapes ---
    "bloom_prefiltered_urgent_revenue",
    "min_cost_supplier_per_part",
    "nation_pair_volume",
    "brand_discount_revenue",
    "small_order_revenue",
    "priority_by_linestatus",
    "top_returning_customers",
    "top_revenue_suppliers",
    "customer_order_distribution",
    "unpivot_pricing_measures",
    "array_functions",
    "ntile_distribution_scaled",
    # --- new round-3 queries (never checked by definition) ---
    # Not all round-3 additions fit the 50-slot window; the round-4
    # rotation queue is: phrase3_retrieval_top20, posting_upsert_merge,
    # benchmark_decontamination, domain_mixture_rates,
    # training_order_shuffle, zorder_layout_stats,
    # streaming_index_maintenance, lsh_recall_audit,
    # embedding_dim_stats, q4_late_orders, q14_promo_revenue,
    # q22_idle_rich_customers, dedup_keep_best, domain_cap_sample,
    # candidate_jaccard_histogram, index_health_audit,
    # domain_mixture_apply, jsonl_ingest_audit,
    # cogroup_user_reconcile, sql_interface_pricing,
    # udtf_token_windows (each
    # operator-adjacent to a query that IS in this window, and all
    # green in the local full-surface gate)
    "index_upsert_merge",
    "ivf_index_upsert",
    "signature_upsert_merge",
    "kmeans_chain_two_steps",
    "compacted_events_checksum",
    "key_skew_profile",
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
