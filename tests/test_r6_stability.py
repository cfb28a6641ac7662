"""Parallelism-stability for the round-6 late additions: the same
query must return IDENTICAL rows under different shuffle-partition
counts — the property that makes the oracle hashes meaningful on a
cluster whose partitioning the engine does not control.
"""

from __future__ import annotations

import pytest

from oracle_vector_search_spark.queries import REGISTRY, load_all_modules

load_all_modules()

STABILITY_QUERIES = [
    "knn_label_propagation",
    "copurchase_bfs_hops",
    "psi_value_drift",
    "dbscan_embedding_clusters",
    "kcore_embedding_graph",
    "vocab_coverage_curve",
    "sprt_ab_sequential_test",
    "class_balanced_sample",
    "embedding_components_single_linkage",
    "hits_event_transitions",
    "graph_degree_assortativity",
    "local_clustering_coefficients",
    "item_cf_similar_parts_top3",
    "kaplan_meier_user_survival",
    "als_rank1_user_step",
    "split_conformal_intervals",
    "did_estimator",
    "mann_whitney_u_test",
    "spearman_value_time_corr",
    "session_hot_hour_overlap",
    "doc_readability_scores",
    "association_rules_pairs",
    "lang_id_confusion_matrix",
    "zipf_slope_fit",
    "kcenter_coreset_seeds",
    "binary_quantization_recall",
    "graph_edges_incremental_merge",
    "prf_rocchio_requery",
    "graph_ann_greedy_walk_recall",
    "qq_deciles_by_arm",
    "two_pass_exact_median",
    "join_size_estimate_audit",
    "ab_power_analysis",
    "streaming_psi_drift_monitor",
    "dedup_soft_sample_weights",
]


def _rows(spark, sf_dir, name):
    df = REGISTRY[name][0](spark, sf_dir)
    return sorted(
        tuple(r) for r in df.collect()
    )


@pytest.mark.parametrize("name", STABILITY_QUERIES)
def test_shuffle_partition_invariance(spark, sf_dir, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, sf_dir, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name} rows differ across partition counts"
