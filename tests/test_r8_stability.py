"""Round-8 stability pins, mirroring tests/test_r7_stability.py:
every round-8 query must produce identical rows regardless of
``spark.sql.shuffle.partitions`` — the cheapest proxy for "no
partitioning-dependent logic leaked into the semantics"."""

from __future__ import annotations

import pytest

from oracle_vector_search_spark.queries import REGISTRY, load_all_modules

load_all_modules()

R8_QUERIES = [
    "reference_crops_clahe_chain_profile",
    "video_keyframe_knn",
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
]


def _rows(spark, sf_dir, name):
    df = REGISTRY[name][0](spark, sf_dir)
    return sorted(
        tuple(r) for r in df.collect()
    )


@pytest.mark.parametrize("name", R8_QUERIES)
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
