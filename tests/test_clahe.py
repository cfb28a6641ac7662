"""T3 dependency-free tier: the pure-numpy CLAHE kernel
(functions/clahe_numpy.py) — the bit-exact twin of the reference
QUERY path's cv2.createCLAHE(4.0, (8, 8)).apply (app.py:60-66).

Layers:
1. frozen scalar goldens (tiny arrays, values from the independent
   scalar implementation in tools/make_clahe_golden.py);
2. vectorized-vs-scalar agreement over adversarial shapes (the
   padding quirk, sub-tile images, length-1 axes, redistribution);
3. cv2-gated exact-equality tests (skip when cv2 absent — this
   container — but run anywhere cv2 exists).
"""

from __future__ import annotations

import numpy as np
import pytest

from oracle_vector_search_spark.functions.clahe_numpy import (
    bgr_to_gray,
    clahe_bgr,
    clahe_gray,
)

try:
    import cv2  # noqa: F401

    HAS_CV2 = True
except ImportError:
    HAS_CV2 = False


def _rand(h: int, w: int, seed: int) -> np.ndarray:
    return (
        np.random.RandomState(seed)
        .randint(0, 256, size=(h, w, 3))
        .astype(np.uint8)
    )


def test_bgr_to_gray_fixed_point() -> None:
    # exact CV_DESCALE examples, hand-computed
    px = np.array([[[10, 20, 30]]], np.uint8)  # B=10 G=20 R=30
    expect = (10 * 1868 + 20 * 9617 + 30 * 4899 + 8192) >> 14
    assert bgr_to_gray(px)[0, 0] == expect
    # gray input is a fixed point of the formula (weights sum to 16384)
    g = np.full((4, 4, 3), 200, np.uint8)
    assert np.array_equal(bgr_to_gray(g), np.full((4, 4), 200, np.uint8))


def test_output_shape_dtype_and_replication() -> None:
    arr = _rand(50, 70, 0)
    out = clahe_bgr(arr)
    assert out.shape == arr.shape and out.dtype == np.uint8
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_constant_image_maps_to_constant() -> None:
    # all mass in one bin → heavy clip + redistribution; output must
    # still be spatially constant (every tile builds the same LUT)
    out = clahe_gray(np.full((64, 64), 128, np.uint8))
    assert out.min() == out.max()


def test_vectorized_equals_scalar_reference() -> None:
    from tools.make_clahe_golden import clahe_independent

    # divisible, non-divisible (both axes), one-divisible-axis (the
    # OpenCV full-extra-tile padding quirk), sub-tile, length-1 axis
    for h, w, seed in [
        (64, 64, 1),
        (37, 53, 2),
        (40, 64, 3),
        (64, 33, 4),
        (7, 7, 5),
        (1, 40, 6),
        (200, 3, 7),
    ]:
        arr = _rand(h, w, seed)
        assert np.array_equal(clahe_bgr(arr), clahe_independent(arr)), (
            h,
            w,
        )


def test_frozen_golden_rows() -> None:
    # 16×16 deterministic ramp, tiles 8×8 → 2×2-tile grid exercised
    # without padding; values frozen from the independent scalar
    # implementation (tools/make_clahe_golden.py)
    g = (np.arange(256, dtype=np.uint8).reshape(16, 16) * 7 % 256).astype(
        np.uint8
    )
    out = clahe_gray(g, clip_limit=4.0, tiles=(8, 8))
    assert out[0, :6].tolist() == [64, 128, 96, 128, 96, 128]
    assert out[8, :6].tolist() == [96, 128, 128, 160, 160, 192]
    assert int(out.astype(np.int64).sum()) == 39576


def test_clip_limit_floor_is_one() -> None:
    # tiny tiles → int(4*area/256) == 0 → OpenCV floors the limit at 1
    g = np.full((16, 16), 7, np.uint8)
    out = clahe_gray(g, clip_limit=4.0, tiles=(8, 8))  # area 4, clip 1
    assert out.min() == out.max()  # constant stays constant


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not installed")
def test_cv2_exact_equality() -> None:
    import cv2

    for h, w, seed in [(64, 64, 11), (37, 53, 12), (100, 23, 13),
                       (640, 640, 14), (9, 160, 15)]:
        gray = (
            np.random.RandomState(seed)
            .randint(0, 256, size=(h, w))
            .astype(np.uint8)
        )
        ours = clahe_gray(gray, 4.0, (8, 8))
        theirs = cv2.createCLAHE(
            clipLimit=4.0, tileGridSize=(8, 8)
        ).apply(gray)
        assert np.array_equal(ours, theirs), (h, w)


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not installed")
def test_cv2_gray_exact_equality() -> None:
    import cv2

    arr = _rand(40, 60, 21)
    assert np.array_equal(
        bgr_to_gray(arr), cv2.cvtColor(arr, cv2.COLOR_BGR2GRAY)
    )
