"""Hypothesis property tests for the numpy-side kernels (no Spark —
fast, wide input coverage)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from oracle_vector_search_spark.functions.embed import (
    hash_projection_embed_numpy,
)
from oracle_vector_search_spark.operators.ann import plane_values
from oracle_vector_search_spark.sources.images import _blur3, _gamma_lut
from oracle_vector_search_spark.sources.media import (
    _decode_audio,
    _decode_video,
    encode_fake_audio,
    encode_fake_video,
)


@given(st.binary(min_size=0, max_size=256))
@settings(max_examples=200, deadline=None)
def test_embedder_unit_norm_and_deterministic(content):
    a = hash_projection_embed_numpy(content, dims=8)
    b = hash_projection_embed_numpy(content, dims=8)
    assert np.array_equal(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9


@given(st.integers(min_value=0, max_value=15), st.integers(2, 128))
@settings(max_examples=50, deadline=None)
def test_plane_values_bounded_and_stable(j, dims):
    p = plane_values(j, dims)
    assert len(p) == dims
    assert all(-1.0 <= x < 1.0 for x in p)
    assert p == plane_values(j, dims)


@given(st.floats(min_value=0.2, max_value=5.0))
@settings(max_examples=50, deadline=None)
def test_gamma_lut_monotone(gamma):
    lut = _gamma_lut(gamma)
    assert lut[0] == 0 and lut[255] == 255
    assert (np.diff(lut.astype(int)) >= 0).all()


@given(st.integers(3, 16), st.integers(3, 16), st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_blur_range_preserving(h, w, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = _blur3(arr)
    assert out.shape == arr.shape
    assert out.min() >= arr.min() - 1 and out.max() <= arr.max() + 1


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_media_decoders_never_raise(garbage):
    # permissive decode contract: arbitrary bytes → None or valid array
    v = _decode_video(garbage)
    assert v is None or v.ndim == 3
    a = _decode_audio(garbage)
    assert a is None or (isinstance(a[0], int) and a[1].ndim == 1)


@given(
    st.integers(1, 5),
    st.integers(1, 8),
    st.integers(1, 8),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_video_roundtrip(n, h, w, seed):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, (n, h, w), dtype=np.uint8)
    back = _decode_video(encode_fake_video(frames))
    assert np.array_equal(back, frames)


@given(st.integers(1, 1000), st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_audio_roundtrip(n, seed):
    rng = np.random.RandomState(seed)
    x = rng.randint(-32768, 32767, n).astype(np.int16)
    sr, back = _decode_audio(encode_fake_audio(x, 16000))
    assert sr == 16000
    assert np.array_equal(back, x)
