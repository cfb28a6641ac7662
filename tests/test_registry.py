"""Registry ordering guard.

The driver's hard correctness gate compares only a 50-entry prefix of
``queries()`` against the DuckDB oracle, so the prefix ROTATES per round
(see ``_PRIORITY``'s comment): a fixed sentinel set is always present,
and the rest of the window is filled with queries that have never had a
driver correctness row. This test pins the sentinel set and the round-6
rotation (42 of the 72 queries added in round 5 that no driver window
has ever checked, oldest first, plus ``scd2_point_in_time_join`` whose
tiebreak behavior changed this round); it fails loudly if registration
drift pushes any of them past position 49. It also pins the documented
registry size so README/COVERAGE counts can't drift from
``len(queries())`` again (VERDICT r5 #3).
"""

from oracle_vector_search_spark import queries as registry

# The single authoritative surface size. README.md and COVERAGE.md must
# state this number; bump it here in the same commit that registers a
# new query.
DOCUMENTED_QUERY_COUNT = 305

SENTINELS = {
    "pipeline_label_parse",
    "pipeline_bbox_denorm",
    "pipeline_index_build",
    "pipeline_query_topk",
    "knn_exact_cosine_top5",
    "knn_exact_cosine_top5_gemm",
    "exact_dedup_groups",
    "streaming_upsert_snapshot",
}

# added in round 5, never driver-checked before — the r6 window takes
# the 42 oldest of the 72; the remaining 30 rotate in during round 7
NEVER_CHECKED_R6 = {
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
    "q3_shipping_priority",
    "q18_large_volume_customers",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q16_parts_supplier",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
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
}

# behavior changed in round 6 (ADVICE r5 high: deterministic version
# tiebreak) — pulled forward into the window for immediate driver check
CHANGED_R6 = {"scd2_point_in_time_join"}


def test_priority_is_exactly_50():
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50


def test_first_50_matches_priority():
    names = list(registry.queries())
    assert names[:50] == list(registry._PRIORITY)


def test_rotation_covers_sentinels_and_never_checked():
    prefix = set(list(registry.queries())[:50])
    must_have = SENTINELS | NEVER_CHECKED_R6 | CHANGED_R6
    assert must_have <= prefix, sorted(must_have - prefix)


def test_registry_size_matches_documented_count():
    qs = registry.queries()
    assert len(qs) == DOCUMENTED_QUERY_COUNT, (
        f"registry has {len(qs)} queries but docs/test say "
        f"{DOCUMENTED_QUERY_COUNT} — update DOCUMENTED_QUERY_COUNT, "
        "README.md and COVERAGE.md together"
    )
    # every registered query carries oracle SQL (zero rows-only entries
    # since r5 — keep it that way)
    assert len(registry.oracle_sql()) == DOCUMENTED_QUERY_COUNT
