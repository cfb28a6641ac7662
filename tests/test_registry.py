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
DOCUMENTED_QUERY_COUNT = 341

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

# r9 window (VERDICT r8 #1): the 42 non-sentinel slots go to ALL 26
# remaining never-driver-checked names (the 7 r6-era names rolled from
# the r8 window + the 19 round-8 additions) plus 16 re-check slots for
# implementations that changed in r8/r9 (CLAHE chain, video fixture
# at-rest move, postings refactor family, r8 speedups, new r9
# registrations). After this window every registered query has a
# driver-side CORRECTNESS row.
NEVER_CHECKED_R9 = {
    "local_clustering_coefficients",
    "graph_edges_incremental_merge",
    "graph_ann_greedy_walk_recall",
    "kcenter_coreset_seeds",
    "streaming_topk_trending",
    "streaming_psi_drift_monitor",
    "zipf_slope_fit",
    "preference_pairs_dpo",
    "bradley_terry_mm_step",
    "preference_agreement_kappa",
    "reward_calibration_ece",
    "best_of_n_selection_lift",
    "unigram_viterbi_tokenize_top30",
    "image_png_decode_parity",
    "streaming_preference_bt_stats",
    "domain_mixture_mw_step",
    "truncation_loss_audit",
    "qdigest_quantile_audit",
    "sft_turn_alternation_audit",
    "sft_loss_mask_accounting",
    "pass_at_k_per_task",
    "grpo_group_advantage",
    "streaming_pass_at_k_stats",
    "epoch_capped_token_allocation",
    "bleu2_pair_eval",
    "preference_length_bias_audit",
}

# implementations changed in r8/r9 — re-checked in the r9 window
RECHECK_R9 = {
    "reference_crops_clahe_chain_profile",
    "video_keyframe_knn",
    "video_mjpeg_frame_parity",
    "ann_recall_vs_exact_clustered",
    "bm25_retrieval_top10",
    "tfidf_cosine_top5",
    "repeated_span_doc_stats",
    "phrase_retrieval_top20",
    "boolean_and_retrieval_top20",
    "bootstrap_mean_ci_deterministic",
    "incremental_corpus_admission",
    "audio_wav_feature_parity",
}


def test_priority_is_exactly_50():
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50


def test_first_50_matches_priority():
    names = list(registry.queries())
    assert names[:50] == list(registry._PRIORITY)


def test_rotation_covers_sentinels_and_never_checked():
    prefix = set(list(registry.queries())[:50])
    must_have = SENTINELS | NEVER_CHECKED_R9 | RECHECK_R9
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
