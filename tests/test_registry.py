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
DOCUMENTED_QUERY_COUNT = 337

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

# r8 window (VERDICT r7 #2): the 42 non-sentinel slots go to 42 of the
# 49 never-driver-checked names — the 2 new round-8 queries, all 10
# round-7 additions, and the oldest 30 round-6-era additions; the 7
# overflow names roll to r9 (see queries/__init__.py's rotation note).
NEVER_CHECKED_R8 = {
    "ann_recall_vs_exact_clustered",
    "audio_wav_feature_parity",
    "wordpiece_greedy_tokenize_top30",
    "video_mjpeg_frame_parity",
    "audio_vad_silence_segments",
    "image_dhash_dup_groups",
    "streaming_audio_vad_admission",
    "l_diversity_audit",
    "dp_noisy_counts_deterministic",
    "mutual_information_features",
    "binary_quantization_recall",
    "prf_rocchio_requery",
    "temporal_holdout_split",
    "session_hot_hour_overlap",
    "kaplan_meier_user_survival",
    "events_burstiness_fano",
    "doc_ngram_novelty",
    "vocab_coverage_curve",
    "doc_readability_scores",
    "lang_id_confusion_matrix",
    "minhash_estimate_error_audit",
    "dedup_soft_sample_weights",
    "psi_value_drift",
    "sprt_ab_sequential_test",
    "split_conformal_intervals",
    "did_estimator",
    "mann_whitney_u_test",
    "spearman_value_time_corr",
    "qq_deciles_by_arm",
    "ab_power_analysis",
    "two_pass_exact_median",
    "join_size_estimate_audit",
    "item_cf_similar_parts_top3",
    "als_rank1_user_step",
    "association_rules_pairs",
    "embedding_components_single_linkage",
    "dbscan_embedding_clusters",
    "hits_event_transitions",
    "kcore_embedding_graph",
    "graph_degree_assortativity",
}

# new in round 8 (VERDICT r7 #3 and #6) — checked in their landing round
NEW_R8 = {
    "reference_crops_clahe_chain_profile",
    "video_keyframe_knn",
}


def test_priority_is_exactly_50():
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50


def test_first_50_matches_priority():
    names = list(registry.queries())
    assert names[:50] == list(registry._PRIORITY)


def test_rotation_covers_sentinels_and_never_checked():
    prefix = set(list(registry.queries())[:50])
    must_have = SENTINELS | NEVER_CHECKED_R8 | NEW_R8
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
