#!/usr/bin/env python
"""Golden generator for `reference_crops_clahe_chain_profile`.

The reference QUERY path preprocesses with CLAHE (app.py:60-66, clip
4.0, 8x8 tiles) rather than the BUILD path's gamma+blur — the SURVEY
§1.4.2 build/query mismatch.  This script freezes goldens for the
engine's pure-numpy TRUE CLAHE (functions/clahe_numpy.py, the
bit-exact cv2 twin that replaced the r≤8 global-equalize stand-in)
composed with the SAME T7/T8 tail as the build chain:

    decode → BGR → T3 CLAHE (clip 4.0, 8×8, cv2 semantics)
           → T7 CNN input tensor → T8 hash-projection embed

Like tools/make_pixel_chain_golden.py (whose independent T7/T8
implementations it reuses), every post-decode transform is
re-implemented INDEPENDENTLY of the production kernels: the CLAHE
here runs scalar per-tile/per-pixel python loops (histogram, clip,
redistribution, LUT, bilinear blend) with np.float32 SCALAR
arithmetic where OpenCV uses float, versus production's fully
vectorized kernel — and the script asserts the two agree crop-by-crop
over all 2,472 real reference crops before printing the per-class-
prefix golden rows.  If cv2 is importable it additionally asserts the
production kernel equals cv2.createCLAHE(4.0, (8, 8)) on every crop.

Run: python tools/make_clahe_golden.py
"""

from __future__ import annotations

import glob
import multiprocessing as mp
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_vector_search_spark.functions.jpeg_numpy import (
    decode_baseline_jpeg,
)
from tools.make_pixel_chain_golden import (
    cnn_tensor_independent,
    embed_independent,
)

CROPS = "/root/reference/cropped_images"
DIMS = 8
F32 = np.float32


def _border_reflect101(p: int, n: int) -> int:
    """OpenCV borderInterpolate(p, n, BORDER_REFLECT_101), scalar."""
    if n == 1:
        return 0
    while p >= n or p < 0:
        p = 2 * n - 2 - p if p >= n else -p
    return p


def clahe_independent(arr_bgr: np.ndarray) -> np.ndarray:
    """Scalar pure-python CLAHE (clip 4.0, 8×8) on the fixed-point
    gray plane — per-pixel loops over python ints, np.float32 SCALARS
    for the LUT scale and bilinear blend (the two places OpenCV uses
    float), np.rint scalars for the round-half-even saturations.
    Structurally independent of the vectorized production kernel."""
    h, w, _ = arr_bgr.shape
    gray = [
        [
            (
                int(arr_bgr[y, x, 0]) * 1868
                + int(arr_bgr[y, x, 1]) * 9617
                + int(arr_bgr[y, x, 2]) * 4899
                + 8192
            )
            >> 14
            for x in range(w)
        ]
        for y in range(h)
    ]
    tiles_y = tiles_x = 8
    if h % tiles_y == 0 and w % tiles_x == 0:
        eh, ew = h, w
        ext = gray
    else:
        eh = h + (tiles_y - h % tiles_y)
        ew = w + (tiles_x - w % tiles_x)
        ext = [
            [
                gray[_border_reflect101(y, h)][_border_reflect101(x, w)]
                for x in range(ew)
            ]
            for y in range(eh)
        ]
    th, tw = eh // tiles_y, ew // tiles_x
    area = th * tw
    clip = max(int(4.0 * area / 256), 1)

    luts: list[list[list[int]]] = []
    scale = F32(255) / F32(area)
    for ty in range(tiles_y):
        row_luts = []
        for tx in range(tiles_x):
            hist = [0] * 256
            for y in range(ty * th, (ty + 1) * th):
                for x in range(tx * tw, (tx + 1) * tw):
                    hist[ext[y][x]] += 1
            clipped = 0
            for i in range(256):
                if hist[i] > clip:
                    clipped += hist[i] - clip
                    hist[i] = clip
            batch, residual = clipped // 256, clipped % 256
            for i in range(256):
                hist[i] += batch
            if residual:
                step = max(256 // residual, 1)
                i = 0
                while i < 256 and residual > 0:
                    hist[i] += 1
                    i += step
                    residual -= 1
            lut, run = [], 0
            for i in range(256):
                run += hist[i]
                v = int(np.rint(F32(run) * scale))
                lut.append(min(max(v, 0), 255))
            row_luts.append(lut)
        luts.append(row_luts)

    inv_th, inv_tw = F32(1) / F32(th), F32(1) / F32(tw)
    out = np.empty((h, w), dtype=np.uint8)
    half = F32(0.5)
    one = F32(1)
    for y in range(h):
        tyf = F32(y) * inv_th - half
        ty1 = int(np.floor(tyf))
        ya = tyf - F32(ty1)
        ya1 = one - ya
        ty2 = min(ty1 + 1, tiles_y - 1)
        ty1 = max(ty1, 0)
        for x in range(w):
            txf = F32(x) * inv_tw - half
            tx1 = int(np.floor(txf))
            xa = txf - F32(tx1)
            xa1 = one - xa
            tx2 = min(tx1 + 1, tiles_x - 1)
            tx1c = max(tx1, 0)
            v = gray[y][x]
            res = (
                F32(luts[ty1][tx1c][v]) * xa1 + F32(luts[ty1][tx2][v]) * xa
            ) * ya1 + (
                F32(luts[ty2][tx1c][v]) * xa1 + F32(luts[ty2][tx2][v]) * xa
            ) * ya
            out[y, x] = min(max(int(np.rint(res)), 0), 255)
    return np.stack([out, out, out], axis=2)


def _one(path: str) -> tuple[str, int, int, int] | None:
    from oracle_vector_search_spark.functions.embed import (
        hash_projection_embed_batch,
    )
    from oracle_vector_search_spark.sources.images import (
        _cnn_input_tensor,
        _equalize_numpy,
    )

    with open(path, "rb") as fh:
        data = fh.read()
    rgb = decode_baseline_jpeg(data)
    assert rgb is not None, path
    bgr = rgb[:, :, ::-1].copy()
    prefix = os.path.basename(path).split("_", 1)[0]

    # production chain
    e_p = _equalize_numpy(bgr)
    t_p = _cnn_input_tensor(e_p)
    v_p = hash_projection_embed_batch([t_p.tobytes()], DIMS)[0]

    # independent chain
    e_i = clahe_independent(bgr)
    t_i = cnn_tensor_independent(e_i)
    v_i = embed_independent(t_i.tobytes())

    ok = (
        np.array_equal(e_p, e_i)
        and t_p.tobytes() == t_i.tobytes()
        and [round(v, 12) for v in v_p] == [round(v, 12) for v in v_i]
    )
    try:
        import cv2

        gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        ok = ok and np.array_equal(
            e_p[:, :, 0], cv2.createCLAHE(4.0, (8, 8)).apply(gray)
        )
    except ImportError:
        pass
    if not ok:
        return None
    return (
        prefix,
        rgb.shape[0] * rgb.shape[1],
        int(e_i.astype(np.int64).sum()),
        int(np.rint(sum(v_i) * 1e6)),
    )


def main() -> None:
    files = sorted(glob.glob(os.path.join(CROPS, "*.jpg")))
    assert files, f"no crops under {CROPS}"
    per_prefix: dict[str, dict[str, int]] = {}
    n_mismatch = 0
    with mp.Pool(min(32, os.cpu_count() or 1)) as pool:
        for i, res in enumerate(pool.imap(_one, files, chunksize=8)):
            if res is None:
                n_mismatch += 1
                print(f"MISMATCH {files[i]}")
                continue
            prefix, px, eq_sum, emb_micros = res
            s = per_prefix.setdefault(
                prefix,
                {"n_crops": 0, "n_pixels": 0, "eq_sum": 0, "emb_micros": 0},
            )
            s["n_crops"] += 1
            s["n_pixels"] += px
            s["eq_sum"] += eq_sum
            s["emb_micros"] += emb_micros
            if (i + 1) % 250 == 0:
                print(f"... {i + 1}/{len(files)}", file=sys.stderr)

    assert n_mismatch == 0, f"{n_mismatch} production-vs-independent diffs"
    print("\n-- golden VALUES rows (prefix, n_crops, n_pixels,")
    print("--   eq_luma_sum, emb_checksum_micros):")
    for p in sorted(per_prefix):
        s = per_prefix[p]
        print(
            f"  ('{p}', {s['n_crops']}, {s['n_pixels']}, "
            f"{s['eq_sum']}, {s['emb_micros']}),"
        )


if __name__ == "__main__":
    main()
