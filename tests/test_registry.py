"""Registry ordering guard.

The driver's hard correctness gate compares only a 50-entry prefix of
``queries()`` against the DuckDB oracle, so the prefix ROTATES per round
(see ``_PRIORITY``'s comment): a fixed sentinel set is always present,
and the rest of the window is filled with queries that have never had a
driver correctness row. This test pins the sentinel set and the round-6
rotation (the 41 never-driver-checked round-5/6 additions, oldest
first, plus ``embedding_covariance_upper`` whose rounding policy changed
this round); it fails loudly if registration drift pushes any of them
past position 49. It also pins the documented
registry size so README/COVERAGE counts can't drift from
``len(queries())`` again (VERDICT r5 #3).
"""

from oracle_vector_search_spark import queries as registry

# The single authoritative surface size. README.md and COVERAGE.md must
# state this number; bump it here in the same commit that registers a
# new query.
DOCUMENTED_QUERY_COUNT = 315

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

# r7 window (VERDICT r6 #1-#2): embedding_covariance_upper re-checked
# after the ±0.0 rounding-policy fix (functions/rounding.py), plus the
# 29 remaining never-driver-checked round-5 additions and the 12 oldest
# round-6 additions. r8 takes the remaining 36 r6 additions.
NEVER_CHECKED_R7 = {
    "source_lang_chisq_divergence",
    "cdc_merge_with_deletes",
    "null_safe_join_audit",
    "xml_roundtrip_checksum",
    "funnel_view_click_purchase",
    "events_trailing_hour_range_sum",
    "incremental_revenue_snapshot",
    "winsorized_value_sums",
    "revenue_yoy_growth",
    "top_orders_with_ties",
    "event_type_value_mode",
    "bpe_merge_pairs_top20",
    "bigram_lm_fluency",
    "seasonal_hour_anomalies",
    "ivf_closure_recall_audit",
    "bpe_apply_merge_recount",
    "c4_sentence_span_dedup",
    "retrieval_ndcg_audit",
    "table_stats_profile",
    "rolling_distinct_users_range",
    "dpp_pruned_event_revenue",
    "golden_record_survivorship",
    "scd2_user_type_intervals",
    "largest_remainder_allocation",
    "user_resurrection_stats",
    "doc_top_keywords",
    "corpus_summary_card",
    "temperature_mixture_allocation",
    "user_event_diversity_simpson",
    "reference_crops_decode_parity",
    "hll_distinct_users_audit",
    "value_ks_drift_audit",
    "doc_char_entropy_quality",
    "value_benford_audit",
    "bootstrap_mean_ci_deterministic",
    "fuzzy_token_pairs_edit1",
    "knn_label_propagation",
    "copurchase_bfs_hops",
    "fim_split_transform",
    "class_balanced_sample",
}

# behavior changed in round 7 (VERDICT r6 #1: round_signed / +0.0
# normalization of signed rounded columns) — re-checked immediately
CHANGED_R7 = {
    "embedding_covariance_upper",
    # new in round 7: real-pixel full-chain parity row (VERDICT r6 #4)
    "reference_crops_pixel_chain_profile",
}


def test_priority_is_exactly_50():
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50


def test_first_50_matches_priority():
    names = list(registry.queries())
    assert names[:50] == list(registry._PRIORITY)


def test_rotation_covers_sentinels_and_never_checked():
    prefix = set(list(registry.queries())[:50])
    must_have = SENTINELS | NEVER_CHECKED_R7 | CHANGED_R7
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
