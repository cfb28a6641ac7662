"""Round-9 stability pins, mirroring tests/test_r8_stability.py:
every round-9 query (and every query whose implementation changed in
round 9) must produce identical rows regardless of
``spark.sql.shuffle.partitions`` — the cheapest proxy for "no
partitioning-dependent logic leaked into the semantics"."""

from __future__ import annotations

import pytest

from oracle_vector_search_spark.queries import REGISTRY, load_all_modules

load_all_modules()

R9_QUERIES = [
    # new round-9 registrations
    "bpe_apply_ranked_merges_top30",
    "suffix_array_repeated_substrings",
    "unigram_em_prune_step",
    "wordpiece_merge_gain_top20",
    # implementations changed in round 9
    "reference_crops_clahe_chain_profile",  # true numpy CLAHE
    "video_keyframe_knn",  # at-rest corpus + GEMM tier
    "video_mjpeg_frame_parity",  # at-rest corpus
    "bleu2_pair_eval",  # single-token bigram guard
    "pca_top_eigenvector",  # explicit matvec broadcast
    "kcenter_coreset_seeds",  # explicit anti-side broadcast
    "sql_udf_knn_top3",  # SQL BROADCAST hint
    "udtf_token_windows",  # Arrow UDTF
    "doc_ngram_novelty",  # pinned gram table + doc-sized join
]


def _rows(spark, sf_dir, name):
    df = REGISTRY[name][0](spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", R9_QUERIES)
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
