"""Registry ordering guard.

The driver's hard correctness gate compares only a 50-entry prefix of
``queries()`` against the DuckDB oracle, so the prefix ROTATES per round
(see ``_PRIORITY``'s comment): a fixed sentinel set is always present,
and the rest of the window is filled with queries that have never had a
driver correctness row. This test pins the sentinel set and the round-5
rotation (the 34 queries added in round 4 that no driver window has
ever checked, the 3 formerly-``no_oracle`` queries that gained real
oracles in r5, and the new r5 queries); it fails loudly if registration
drift pushes any of them past position 49.
"""

from oracle_vector_search_spark import queries as registry

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

# added in round 4, never driver-checked before — all must be in the
# r5 window so the driver's signal finally covers them
NEVER_CHECKED_R5 = {
    "matryoshka_recall_audit",
    "sql_udf_knn_top3",
    "view_next_purchase_asof",
    "retention_cohorts",
    "session_path_bigrams",
    "repeated_span_doc_stats",
    "boilerplate_spans_per_source",
    "countmin_token_freq_audit",
    "per_group_linear_fit",
    "mad_outlier_flags",
    "maxsim_late_interaction_top5",
    "span_corruption_pairs",
    "hybrid_rrf_retrieval_top10",
    "profile_guided_skew_join_spend",
    "k_anonymity_audit",
    "range_checksum_diff",
    "yolo_source_class_stats",
    "streaming_dedup_within_watermark",
    "orc_roundtrip_checksum",
    "csv_roundtrip_checksum",
    "merge_schema_evolution_audit",
    "equidepth_value_histogram",
    "domain_oversample_apply",
    "embedding_drift_audit",
    "event_type_twap",
    "recursive_ancestry_rollup",
    "variant_props_stats",
    "events_ohlc_bars",
    "value_skew_kurtosis_exact",
    "lsh_multiprobe_topk",
    "filtered_knn_label",
    "multiprobe_recall_audit",
    "hamming_knn_top5",
    "dedup_cleaned_corpus_checksum",
}

# formerly no_oracle, oracle-ified in r5 (VERDICT r4 #2) — must be
# driver re-verified with their new exact oracles
ORACLEIFIED_R5 = {
    "approx_aggregates",
    "packed_bins_greedy",
    "streaming_sliding_windows_watermark",
}

# brand-new in round 5
NEW_R5 = {
    "reference_labels_index_parity",
    "knn_exact_gemm_int8",
    "sq8_recall_refine_audit",
    "dedup_cascade_scaling_probe",
    "key_profile_at_rest",
}


def test_priority_is_exactly_50():
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50


def test_first_50_matches_priority():
    names = list(registry.queries())
    assert names[:50] == list(registry._PRIORITY)


def test_rotation_covers_sentinels_and_never_checked():
    prefix = set(list(registry.queries())[:50])
    must_have = SENTINELS | NEVER_CHECKED_R5 | ORACLEIFIED_R5 | NEW_R5
    assert must_have <= prefix, sorted(must_have - prefix)


def test_oracle_sql_keys_subset_of_queries():
    q = registry.queries()
    o = registry.oracle_sql()
    assert set(o) <= set(q)
    # same ordering discipline applies to oracle_sql()
    order = {n: i for i, n in enumerate(q)}
    keys = list(o)
    assert keys == sorted(keys, key=order.__getitem__)


def test_bench_headline_subset_of_registry():
    """bench.py's HEADLINE set must always be runnable through the
    registry — a renamed/removed query must fail here, not in the
    driver's bench run."""
    import bench

    q = registry.queries()
    missing = [n for n in bench.HEADLINE if n not in q]
    assert not missing, missing
    assert set(bench.AT_REST_WRITERS) <= set(bench.HEADLINE)


def test_tpch_analogue_sweep_complete():
    """All 22 TPC-H query shapes have a registered, oracle-backed
    analogue (adapted to the fixture schema where the spec needs
    partsupp/commitdate — see tpch2_queries docstring)."""
    from oracle_vector_search_spark.queries import (
        REGISTRY,
        load_all_modules,
    )

    load_all_modules()
    analogues = {
        1: "q1_pricing_summary",
        2: "min_cost_supplier_per_part",
        3: "q3_shipping_priority",
        4: "q4_late_orders",
        5: "revenue_by_nation",
        6: "q6_forecast_revenue",
        7: "nation_pair_volume",
        8: "q8_market_share",
        9: "q9_product_profit",
        10: "top_returning_customers",
        11: "q11_important_stock",
        12: "priority_by_linestatus",
        13: "customer_order_distribution",
        14: "q14_promo_revenue",
        15: "top_revenue_suppliers",
        16: "q16_parts_supplier",
        17: "small_order_revenue",
        18: "q18_large_volume_customers",
        19: "brand_discount_revenue",
        20: "q20_excess_suppliers",
        21: "q21_waiting_suppliers",
        22: "q22_idle_rich_customers",
    }
    missing = {
        q: name for q, name in analogues.items() if name not in REGISTRY
    }
    assert not missing, f"TPC-H analogues missing: {missing}"
    # every analogue carries a DuckDB oracle (no rows-only entries)
    no_oracle = {
        q: name
        for q, name in analogues.items()
        if REGISTRY[name][1] is None
    }
    assert not no_oracle, f"TPC-H analogues without oracle: {no_oracle}"
