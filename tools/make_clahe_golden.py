#!/usr/bin/env python
"""Golden generator for `reference_crops_clahe_chain_profile`.

The reference QUERY path preprocesses with CLAHE (app.py:60-66, clip
4.0, 8x8 tiles) rather than the BUILD path's gamma+blur — the SURVEY
§1.4.2 build/query mismatch.  This script freezes goldens for the
engine's deterministic numpy equalize stand-in
(sources/images.py `_equalize_numpy`) composed with the SAME T7/T8
tail as the build chain:

    decode → T3 equalize (mean-channel global hist-eq)
           → T7 CNN input tensor → T8 hash-projection embed

Like tools/make_pixel_chain_golden.py (whose independent T7/T8
implementations it reuses), every post-decode transform is
re-implemented INDEPENDENTLY of the production kernels — the equalize
here builds its histogram with a pure-python per-pixel loop over
python ints and its LUT with math-module arithmetic, versus
production's numpy bincount/cumsum/rint — and the script asserts the
two implementations agree crop-by-crop over all 2,472 real reference
crops before printing the per-class-prefix golden rows.

Run: python tools/make_clahe_golden.py
"""

from __future__ import annotations

import glob
import math
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


def equalize_independent(arr: np.ndarray) -> np.ndarray:
    """Mean-channel global histogram equalization, pure-python ints.

    Production (`_equalize_numpy`): numpy mean → bincount → cumsum →
    one vectorized rint rescale.  Here: per-pixel int loops and
    math-module rounding.  The only float op on both sides is the
    identical (cdf - cdf_min) / span * 255 rescale in double
    precision, so agreement is exact, not approximate."""
    h, w, c = arr.shape
    hist = [0] * 256
    gray_rows: list[list[int]] = []
    for y in range(h):
        row = []
        for x in range(w):
            s = 0
            for ch in range(c):
                s += int(arr[y, x, ch])
            g = int(s / c)  # numpy float mean then uint8 cast truncates
            row.append(g)
            hist[g] += 1
        gray_rows.append(row)
    cdf = []
    run = 0
    for v in hist:
        run += v
        cdf.append(run)
    nz = [v for v in cdf if v > 0]
    if not nz:
        return arr
    cdf_min = nz[0]
    span = max(cdf[-1] - cdf_min, 1)
    lut = []
    for v in cdf:
        x = (v - cdf_min) / span * 255.0
        # np.rint = round-half-to-even
        r = int(math.floor(x + 0.5))
        if r - x == 0.5 and r % 2 == 1:
            r -= 1
        lut.append(min(max(r, 0), 255))
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            out[y, x, :] = lut[gray_rows[y][x]]
    return out


def main() -> None:
    from oracle_vector_search_spark.functions.embed import (
        hash_projection_embed_batch,
    )
    from oracle_vector_search_spark.sources.images import (
        _cnn_input_tensor,
        _equalize_numpy,
    )

    per_prefix: dict[str, dict[str, int]] = {}
    n_mismatch = 0
    files = sorted(glob.glob(os.path.join(CROPS, "*.jpg")))
    assert files, f"no crops under {CROPS}"
    for i, path in enumerate(files):
        with open(path, "rb") as fh:
            data = fh.read()
        arr = decode_baseline_jpeg(data)
        assert arr is not None, path
        prefix = os.path.basename(path).split("_", 1)[0]

        # production chain
        e_p = _equalize_numpy(arr)
        t_p = _cnn_input_tensor(e_p)
        v_p = hash_projection_embed_batch([t_p.tobytes()], DIMS)[0]

        # independent chain
        e_i = equalize_independent(arr)
        t_i = cnn_tensor_independent(e_i)
        v_i = embed_independent(t_i.tobytes())

        if not (
            np.array_equal(e_p, e_i)
            and t_p.tobytes() == t_i.tobytes()
            and [round(x, 12) for x in v_p] == [round(x, 12) for x in v_i]
        ):
            n_mismatch += 1
            print(f"MISMATCH {path}")
            continue

        s = per_prefix.setdefault(
            prefix,
            {"n_crops": 0, "n_pixels": 0, "eq_sum": 0, "emb_micros": 0},
        )
        s["n_crops"] += 1
        s["n_pixels"] += arr.shape[0] * arr.shape[1]
        s["eq_sum"] += int(e_i.astype(np.int64).sum())
        s["emb_micros"] += int(np.rint(sum(v_i) * 1e6))
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
