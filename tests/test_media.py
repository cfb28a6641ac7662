"""Multimodal audio/video plumbing tests (schemas, UDTF shapes,
permissive decode, partition stability)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from oracle_vector_search_spark.sources.media import (
    audio_features,
    encode_fake_audio,
    encode_fake_video,
    resize_frames,
    video_frame_sample,
)


def _videos(spark):
    rng = np.random.RandomState(7)
    rows = [
        (1, encode_fake_video(rng.randint(0, 255, (6, 8, 10), dtype=np.uint8))),
        (2, encode_fake_video(rng.randint(0, 255, (3, 8, 10), dtype=np.uint8))),
        (3, b"not a video"),  # undecodable → dropped
        (4, None),
    ]
    return spark.createDataFrame(rows, "id long, content binary")


def test_video_frame_sampling(spark):
    frames = video_frame_sample(_videos(spark), every_k=2).collect()
    got = sorted((r["id"], r["frame_idx"]) for r in frames)
    assert got == [(1, 0), (1, 2), (1, 4), (2, 0), (2, 2)]
    assert all(r["width"] == 10 and r["height"] == 8 for r in frames)
    assert all(len(bytes(r["frame"])) == 80 for r in frames)


def test_frame_resize(spark):
    frames = video_frame_sample(_videos(spark), every_k=3)
    resized = resize_frames(frames, out_w=4, out_h=4).collect()
    assert resized
    for r in resized:
        assert r["width"] == 4 and r["height"] == 4
        assert len(bytes(r["frame"])) == 16


def test_audio_features(spark):
    sr = 8000
    t = np.arange(sr)  # 1 second
    sine = (np.sin(2 * np.pi * 440 * t / sr) * 10000).astype(np.int16)
    silence = np.zeros(sr // 2, dtype=np.int16)
    rows = [
        (1, encode_fake_audio(sine, sr)),
        (2, encode_fake_audio(silence, sr)),
        (3, b"garbage"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    feats = {r["id"]: r for r in audio_features(df).collect()}
    assert set(feats) == {1, 2}
    assert abs(feats[1]["duration_sec"] - 1.0) < 1e-9
    assert feats[1]["rms"] > 6000  # sine RMS ≈ amplitude/√2 ≈ 7071
    assert abs(feats[1]["zero_crossing_rate"] - 880 / sr) < 0.02
    assert feats[2]["rms"] == 0.0 and feats[2]["peak"] == 0


def test_media_partition_stability(spark):
    v = _videos(spark)
    a = sorted(map(tuple, video_frame_sample(v, 2).collect()))
    b = sorted(map(tuple, video_frame_sample(v.repartition(5), 2).collect()))
    assert a == b
