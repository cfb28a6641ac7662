"""Pure-numpy CLAHE — bit-exact twin of OpenCV's
``createCLAHE(clipLimit, tileGridSize).apply(gray)``.

The reference QUERY path preprocesses with CLAHE (app.py:60-66:
BGR→gray, clip 4.0, 8×8 tiles, gray→BGR).  cv2 is an optional
dependency of this engine, so this module re-implements the exact
algorithm with numpy only, following the published OpenCV algorithm
(modules/imgproc/src/clahe.cpp) step by step:

1. If either dimension is not divisible by the tile grid, extend the
   image right/bottom with BORDER_REFLECT_101 by ``tiles - size %
   tiles`` (OpenCV pads BOTH axes in that branch, a full extra tile on
   an already-divisible axis — quirk reproduced deliberately).
2. Per tile: 256-bin histogram; clip at
   ``max(int(clip * tile_area / 256), 1)``; redistribute the clipped
   mass uniformly (``excess // 256`` to every bin) and the residual
   one count at a time at stride ``max(256 // residual, 1)`` starting
   from bin 0 (one pass — bins may exceed the limit again, as in
   OpenCV).
3. LUT per tile: cumulative histogram × ``float32(255) / tile_area``,
   rounded half-to-even and saturated to uint8.
4. Per ORIGINAL pixel: bilinear blend of the 4 surrounding tile LUTs,
   float32 weights ``t·(1/tile) − 0.5`` with edge clamping, grouped
   ``(l11·xa1 + l12·xa)·ya1 + (l21·xa1 + l22·xa)·ya``, rounded
   half-to-even.

All float math is float32 in the same association order OpenCV uses,
so output is bit-identical to cv2 (asserted by a cv2-gated test) and
bit-stable across platforms.
"""

from __future__ import annotations

import numpy as np

_HIST_SIZE = 256


def bgr_to_gray(arr: np.ndarray) -> np.ndarray:
    """cv2.cvtColor(..., COLOR_BGR2GRAY) fixed-point twin:
    ``Y = (B·1868 + G·9617 + R·4899 + 8192) >> 14`` (the published
    CV_DESCALE path with yuv_shift 14)."""
    a = arr.astype(np.int64)
    y = (a[..., 0] * 1868 + a[..., 1] * 9617 + a[..., 2] * 4899 + 8192) >> 14
    return y.astype(np.uint8)


def _reflect101_indices(n: int, pad: int) -> np.ndarray:
    """Source indices for BORDER_REFLECT_101 right/bottom extension of
    a length-``n`` axis by ``pad`` — OpenCV borderInterpolate: fold
    ``p → 2n − 2 − p`` (and ``p → −p`` at the low edge) until in
    range; a length-1 axis always maps to 0."""
    if n == 1:
        return np.zeros(pad, dtype=np.int64)
    idx = np.arange(n, n + pad, dtype=np.int64)
    while True:
        hi = idx >= n
        lo = idx < 0
        if not (hi.any() or lo.any()):
            return idx
        idx[hi] = 2 * n - 2 - idx[hi]
        idx[lo] = -idx[lo]


def _tile_luts(
    src: np.ndarray, tiles_y: int, tiles_x: int, clip_limit: float
) -> tuple[np.ndarray, int, int]:
    """(tiles_y, tiles_x, 256) uint8 LUT stack + the (padded) tile
    height/width the interpolation weights use."""
    h, w = src.shape
    if h % tiles_y or w % tiles_x:
        pad_h = tiles_y - h % tiles_y  # == tiles_y when h is divisible
        pad_w = tiles_x - w % tiles_x  # (OpenCV's else-branch quirk)
        src = src[
            np.concatenate([np.arange(h), _reflect101_indices(h, pad_h)])
        ][:, np.concatenate([np.arange(w), _reflect101_indices(w, pad_w)])]
        h, w = src.shape
    th, tw = h // tiles_y, w // tiles_x
    area = th * tw
    clip = max(int(clip_limit * area / _HIST_SIZE), 1)

    n_tiles = tiles_y * tiles_x
    tile_id = (
        np.arange(n_tiles).reshape(tiles_y, 1, tiles_x, 1) * _HIST_SIZE
    )
    keyed = src.reshape(tiles_y, th, tiles_x, tw).astype(np.int64) + tile_id
    hists = np.bincount(
        keyed.ravel(), minlength=n_tiles * _HIST_SIZE
    ).reshape(n_tiles, _HIST_SIZE)

    clipped = np.maximum(hists - clip, 0).sum(axis=1)
    np.minimum(hists, clip, out=hists)
    hists += (clipped // _HIST_SIZE)[:, None]
    residual = clipped % _HIST_SIZE
    for t in np.nonzero(residual)[0]:
        r = int(residual[t])
        step = max(_HIST_SIZE // r, 1)
        hists[t, np.arange(0, _HIST_SIZE, step)[:r]] += 1

    scale = np.float32(_HIST_SIZE - 1) / np.float32(area)
    luts = np.clip(
        np.rint(hists.cumsum(axis=1).astype(np.float32) * scale), 0, 255
    ).astype(np.uint8)
    return luts.reshape(tiles_y, tiles_x, _HIST_SIZE), th, tw


def _axis_weights(
    n: int, tile: int, n_tiles: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-coordinate (lo_tile, hi_tile, frac) for the bilinear blend —
    ``t·(1/tile) − 0.5`` in float32, floor, clamp to [0, n_tiles−1]."""
    inv = np.float32(1.0) / np.float32(tile)
    f = np.arange(n, dtype=np.float32) * inv - np.float32(0.5)
    lo = np.floor(f).astype(np.int64)
    frac = (f - lo.astype(np.float32)).astype(np.float32)
    hi = np.minimum(lo + 1, n_tiles - 1)
    lo = np.maximum(lo, 0)
    return lo, hi, frac


def clahe_gray(
    gray: np.ndarray,
    clip_limit: float = 4.0,
    tiles: tuple[int, int] = (8, 8),
) -> np.ndarray:
    """CLAHE on a single-channel uint8 image — the engine's
    dependency-free T3 tier, bit-exact to
    ``cv2.createCLAHE(clip_limit, tiles).apply(gray)``."""
    tiles_x, tiles_y = tiles  # cv2 tileGridSize is (cols, rows)
    h, w = gray.shape
    luts, th, tw = _tile_luts(gray, tiles_y, tiles_x, clip_limit)

    ty1, ty2, ya = _axis_weights(h, th, tiles_y)
    tx1, tx2, xa = _axis_weights(w, tw, tiles_x)
    ya1 = (np.float32(1.0) - ya)[:, None]
    xa1 = (np.float32(1.0) - xa)[None, :]
    ya = ya[:, None]
    xa = xa[None, :]

    v = gray.astype(np.int64)
    l11 = luts[ty1[:, None], tx1[None, :], v].astype(np.float32)
    l12 = luts[ty1[:, None], tx2[None, :], v].astype(np.float32)
    l21 = luts[ty2[:, None], tx1[None, :], v].astype(np.float32)
    l22 = luts[ty2[:, None], tx2[None, :], v].astype(np.float32)
    res = (l11 * xa1 + l12 * xa) * ya1 + (l21 * xa1 + l22 * xa) * ya
    return np.clip(np.rint(res), 0, 255).astype(np.uint8)


def clahe_bgr(
    arr: np.ndarray,
    clip_limit: float = 4.0,
    tiles: tuple[int, int] = (8, 8),
) -> np.ndarray:
    """app.py:60-66 ``apply_clahe_to_image`` twin: BGR → gray → CLAHE
    → replicate to 3 channels."""
    eq = clahe_gray(bgr_to_gray(arr), clip_limit, tiles)
    return np.stack([eq, eq, eq], axis=2)
