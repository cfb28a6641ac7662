"""Parallelism-stability for the round-7 additions — same discipline
as test_r6_stability: identical rows under different shuffle-partition
counts, the property that makes oracle hashes meaningful on a cluster
whose partitioning the engine does not control."""

from __future__ import annotations

import pytest

from oracle_vector_search_spark.queries import REGISTRY, load_all_modules

load_all_modules()

STABILITY_QUERIES = [
    "ann_recall_vs_exact_clustered",
    "audio_wav_feature_parity",
    "wordpiece_greedy_tokenize_top30",
    "reference_crops_pixel_chain_profile",
    "video_mjpeg_frame_parity",
    "audio_vad_silence_segments",
    "image_dhash_dup_groups",
    "streaming_audio_vad_admission",
    "l_diversity_audit",
    "dp_noisy_counts_deterministic",
    "mutual_information_features",
]


def _rows(spark, sf_dir, name):
    df = REGISTRY[name][0](spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


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
