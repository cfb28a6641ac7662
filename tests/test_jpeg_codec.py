"""Pure-numpy baseline JPEG codec (functions/jpeg_numpy.py).

Round-trip property: the encoder (forward DCT + constructed Annex K
tables) and the decoder (inverse DCT + stream-parsed tables) are
independent implementations; agreement within quantization tolerance
validates both. Real-data facts (all 2,472 reference crops decode,
dims match labels) are pinned by the oracle-checked
``reference_crops_decode_parity`` query; here we cover the codec's
unit-level contracts and the F3 permissive rule.
"""

from __future__ import annotations

import numpy as np
import pytest

from oracle_vector_search_spark.functions.jpeg_numpy import (
    decode_baseline_jpeg,
    encode_gray_jpeg,
    jpeg_decode_stats,
    jpeg_luma_means,
)


def _smooth(h, w, seed=0):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    rng = np.random.RandomState(seed)
    a, b = rng.uniform(4, 12, 2)
    return (
        128 + 80 * np.sin(x / a) * np.cos(y / b)
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "h,w", [(8, 8), (37, 50), (64, 64), (13, 9), (1, 1), (17, 128)]
)
def test_roundtrip_smooth_images(h, w):
    img = _smooth(h, w, seed=h * 131 + w)
    dec = decode_baseline_jpeg(encode_gray_jpeg(img))
    assert dec is not None
    assert dec.shape == (h, w, 3)
    # grayscale stream: all three channels identical
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    err = np.abs(dec[:, :, 0].astype(float) - img.astype(float))
    # quantization tolerance: smooth content, Annex K tables
    assert err.mean() < 4.0, err.mean()
    assert err.max() < 40.0, err.max()


def test_roundtrip_noise_image_decodes():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (41, 53)).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_gray_jpeg(img))
    assert dec is not None and dec.shape == (41, 53, 3)


def test_roundtrip_flat_image_is_near_exact():
    img = np.full((24, 31), 200, dtype=np.uint8)
    dec = decode_baseline_jpeg(encode_gray_jpeg(img))
    assert dec is not None
    assert np.abs(dec[:, :, 0].astype(int) - 200).max() <= 2


def test_dc_vs_idct_means_agree():
    img = _smooth(48, 40, seed=3)
    data = encode_gray_jpeg(img)
    means = jpeg_luma_means(data)
    assert means is not None
    idct_m, dc_m = means
    assert abs(idct_m - dc_m) < 0.05
    stats = jpeg_decode_stats(data)
    assert stats is not None and stats[:2] == (48, 40)


def test_malformed_inputs_return_none_never_raise():
    img = _smooth(16, 16)
    good = encode_gray_jpeg(img)
    cases = [
        b"",
        b"NOTAJPEG",
        good[:2],          # bare SOI
        good[:50],         # truncated mid-tables
        good[:-40],        # truncated entropy stream
        good[:2] + b"\xff\xd9",  # SOI+EOI, no scan
        b"\xff\xd8" + b"\x00" * 64,
    ]
    for c in cases:
        assert decode_baseline_jpeg(c) is None
        assert jpeg_decode_stats(c) is None


def test_decode_one_jpeg_tier_in_image_source():
    """S2: _decode_one now decodes real JPEG bytes without cv2 and
    returns BGR (cv2 convention) — the engine-wide pixel tier."""
    from oracle_vector_search_spark.sources.images import _decode_one

    img = _smooth(20, 30, seed=9)
    arr = _decode_one(encode_gray_jpeg(img))
    assert arr is not None and arr.shape == (20, 30, 3)
    assert arr.dtype == np.uint8
    assert _decode_one(b"\xff\xd8garbage") is None


def test_real_reference_crop_decodes_if_present():
    import glob

    files = sorted(
        glob.glob("/root/reference/cropped_images/*.jpg")
    )[:3]
    if not files:
        pytest.skip("reference crops not present")
    for p in files:
        raw = open(p, "rb").read()
        stats = jpeg_decode_stats(raw)
        assert stats is not None
        h, w, idct_m, dc_m = stats
        assert h > 0 and w > 0
        assert abs(idct_m - dc_m) < 0.05
        rgb = decode_baseline_jpeg(raw)
        assert rgb is not None and rgb.shape == (h, w, 3)
