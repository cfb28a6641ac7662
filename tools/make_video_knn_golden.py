#!/usr/bin/env python
"""Golden generator for `video_keyframe_knn`.

The video→vector bridge value — the md5 hex of each keyframe's CNN
input tensor bytes — cannot be re-derived inside DuckDB 1.0 (its
`md5()` accepts VARCHAR only; casting a BLOB to VARCHAR escapes the
bytes, so raw-byte digests are inexpressible).  The query's oracle
therefore freezes that ONE bridge per keyframe and re-derives
everything downstream genuinely in SQL: md5 → 64-dim hash-projection
embedding → L2 normalize → cosine top-k against the embeddings view.

This script produces the frozen bridges the same way
tools/make_pixel_chain_golden.py does — two independent routes,
asserted equal per keyframe before anything is printed:

* production route: functions/avi_numpy.py encode → sources/media.py
  `_decode_video` (the real container walk + JPEG entropy decode used
  by `video_frame_sample`) → grayscale→3ch stack →
  sources/images.py `_cnn_input_tensor`;
* independent route: frame pixels straight from the generating
  formula (never touching the codec), tensor via
  tools/make_pixel_chain_golden.cnn_tensor_independent.

The clip corpus is EXACTLY `video_mjpeg_frame_parity`'s (same
generator constants), whose oracle already proves the codec path
byte-exact, so the two queries compose into full coverage:
formula → container → frames (parity query) → tensor → embedding →
kNN (this query).

Run: python tools/make_video_knn_golden.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_pixel_chain_golden import cnn_tensor_independent

N_CLIPS = 32
H, W = 16, 24
EVERY_K = 4


def main() -> None:
    from oracle_vector_search_spark.functions.avi_numpy import (
        encode_avi_mjpeg,
    )
    from oracle_vector_search_spark.sources.images import (
        _cnn_input_tensor,
    )
    from oracle_vector_search_spark.sources.media import _decode_video

    rows = []
    for c in range(N_CLIPS):
        nf = 4 + c % 5
        frames = np.stack(
            [
                np.full((H, W), 2 * ((c * 37 + f * 11) % 128), np.uint8)
                for f in range(nf)
            ]
        )
        dec = _decode_video(encode_avi_mjpeg(frames, fps=10 + c % 3))
        assert dec is not None and dec.shape == frames.shape, c
        for f in range(0, nf, EVERY_K):
            # production route: decoded frame -> 3ch -> production tensor
            g_p = dec[f]
            t_p = _cnn_input_tensor(np.stack([g_p, g_p, g_p], axis=2))
            md5_p = hashlib.md5(t_p.tobytes()).hexdigest()

            # independent route: formula pixels -> independent tensor
            v = 2 * ((c * 37 + f * 11) % 128)
            a_i = np.full((H, W, 3), v, np.uint8)
            t_i = cnn_tensor_independent(a_i)
            md5_i = hashlib.md5(t_i.tobytes()).hexdigest()

            assert md5_p == md5_i, (c, f, md5_p, md5_i)
            rows.append((c, f, md5_p))

    print("-- golden VALUES rows (clip_id, frame_idx, tensor_md5):")
    for c, f, m in rows:
        print(f"  ({c}, {f}, '{m}'),")
    print(f"-- {len(rows)} keyframes")


if __name__ == "__main__":
    main()
