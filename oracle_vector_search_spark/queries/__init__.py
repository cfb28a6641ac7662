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
        "tpch2_queries",
        "analytics_queries",
        "graph_queries",
        "linalg_queries",
        "pipeline_queries",
        "streaming_queries",
        "format_queries",
        "curation_queries",
        "lm_queries",
    ):
        __import__(f"oracle_vector_search_spark.queries.{mod}")


# Registry ordering exposed to the driver. The driver's hard correctness
# gate checks a 50-entry prefix of queries(), so the prefix ROTATES each
# round to spread verification across the whole registry:
#   r1 ∪ r2 ∪ r3 ∪ r4 ∪ r5 windows = every query that existed before
#   round 5 (186 distinct driver-checked names; CORRECTNESS_r05 was
#   50/50 green).
#   r6 (this file) = 8 always-on sentinels + 42 of the 72 queries ADDED
#   during round 5 that no driver window has seen (oldest additions
#   first, per VERDICT r5 #1; every one verified value-exact against
#   its DuckDB oracle by both the builder's full-registry gate and the
#   judge's independent re-run). `scd2_point_in_time_join` is pulled
#   forward from the r7 batch because its tiebreak behavior changed
#   this round (ADVICE r5 high) and the fix should get the hard
#   external check immediately.
#   Queries past position 49 remain verified by the local gate
#   (tools/oracle_check.py, full surface, CI via
#   tests/test_oracle_surface.py). Keep this list at exactly 50 names.
#   r7 rotation TODO: swap these 42 for the remaining 30 never-checked
#   r5 additions — source_lang_chisq_divergence,
#   cdc_merge_with_deletes, null_safe_join_audit,
#   xml_roundtrip_checksum, funnel_view_click_purchase,
#   events_trailing_hour_range_sum, incremental_revenue_snapshot,
#   winsorized_value_sums, revenue_yoy_growth, top_orders_with_ties,
#   event_type_value_mode, bpe_merge_pairs_top20, bigram_lm_fluency,
#   seasonal_hour_anomalies, ivf_closure_recall_audit,
#   bpe_apply_merge_recount, c4_sentence_span_dedup,
#   retrieval_ndcg_audit, table_stats_profile,
#   rolling_distinct_users_range, dpp_pruned_event_revenue,
#   golden_record_survivorship, scd2_user_type_intervals,
#   largest_remainder_allocation, user_resurrection_stats,
#   doc_top_keywords, corpus_summary_card,
#   temperature_mixture_allocation, user_event_diversity_simpson —
#   plus the queries added in round 6 (reference_crops_decode_parity,
#   hll_distinct_users_audit, value_ks_drift_audit,
#   doc_char_entropy_quality, value_benford_audit,
#   bootstrap_mean_ci_deterministic, fuzzy_token_pairs_edit1,
#   knn_label_propagation, copurchase_bfs_hops, fim_split_transform,
#   class_balanced_sample, doc_ngram_novelty, streaming_topk_trending,
#   temporal_holdout_split, psi_value_drift, vocab_coverage_curve,
#   embedding_components_single_linkage, dbscan_embedding_clusters,
#   hits_event_transitions, sprt_ab_sequential_test,
#   doc_readability_scores, session_hot_hour_overlap,
#   item_cf_similar_parts_top3, kaplan_meier_user_survival,
#   als_rank1_user_step, split_conformal_intervals, did_estimator,
#   mann_whitney_u_test, spearman_value_time_corr,
#   kcenter_coreset_seeds, binary_quantization_recall, zipf_slope_fit,
#   streaming_psi_drift_monitor, association_rules_pairs,
#   lang_id_confusion_matrix, graph_edges_incremental_merge,
#   prf_rocchio_requery, graph_ann_greedy_walk_recall,
#   qq_deciles_by_arm).
#
#   CONCRETE r7 WINDOW (one-edit swap — replace everything after the 8
#   sentinels with these 42; all are locally oracle-green at sf0.01
#   AND sf0.1 as of round-6 close):
#     the 30 never-driver-checked r5 additions listed above, PLUS the
#     12 oldest round-6 additions:
#       reference_crops_decode_parity, hll_distinct_users_audit,
#       value_ks_drift_audit, doc_char_entropy_quality,
#       value_benford_audit, bootstrap_mean_ci_deterministic,
#       fuzzy_token_pairs_edit1, knn_label_propagation,
#       copurchase_bfs_hops, fim_split_transform,
#       class_balanced_sample, doc_ngram_novelty.
#   r8 then takes the remaining 26 r6 additions (streaming_topk_trending
#   through ab_power_analysis in registration order).
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
    # --- r5 additions, never driver-checked: curation/LM family ---
    "quality_classifier_keep",
    "dsir_importance_select",
    "semantic_dedup_keep",
    "lm_perplexity_buckets",
    "shard_export_manifest",
    "curated_corpus_checksum",
    "incremental_corpus_admission",
    "sequential_poisson_sample",
    "media_frame_manifest",
    "streaming_corpus_admission",
    # --- r5 additions: TPC-H completions ---
    "q3_shipping_priority",
    "q18_large_volume_customers",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q16_parts_supplier",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    # --- r5 additions: analytics / graph / feature kernels ---
    "dedup_graph_triangles",
    "ab_test_event_value_z",
    "events_user_ewma",
    "events_user_cusum",
    "synopsis_range_count_audit",
    "retrieval_map_audit",
    "knn_classifier_confusion",
    "revenue_rollup_nation_year",
    "customer_spend_window_suite",
    "quantity_quantiles_by_flag",
    "set_ops_customer_cohorts",
    "knn_radius_search",
    "pagerank_event_transitions",
    # --- r5 additions: linear algebra / retrieval / ANN ---
    "embedding_gram_upper",
    "embedding_covariance_upper",
    "pca_top_eigenvector",
    "tfidf_cosine_top5",
    "copurchase_part_pairs_top20",
    "events_hourly_gapfill_ffill",
    "events_rolling_median_value",
    "ivfpq_ann_topk",
    "ivfpq_residual_fidelity",
    "pareto_skyline_orders",
    # --- behavior changed this round (ADVICE r5 high): verify now ---
    "scd2_point_in_time_join",
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
