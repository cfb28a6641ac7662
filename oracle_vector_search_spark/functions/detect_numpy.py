"""Deterministic pure-numpy box proposer (SURVEY.md §2.3 T9).

The reference detects tumors with YOLOv8 (app.py:113-128:
``yolo(clahe_image)`` → ``result.boxes``) but its weights file
(``best.pt``) is absent from the public snapshot, so exact YOLO parity
is unreachable by anyone. This module is the deterministic closure of
the detect stage: a classical *threshold → connected components →
confidence-ranked boxes* proposer with zero dependencies beyond numpy.
Every step is a pure function of the pixel array, so the whole online
query path (detect → F5 guard → A1 argmax → T6 crop → T8 embed →
M1 search, app.py stages 2-7) becomes oracle-checkable end-to-end
(queries/pipeline_queries.py:query_path_detect_search). The
ultralytics-gated tier plugs in at the same operator seam
(sources/images.py:detect_boxes) when real weights are available.

Detector contract (all deterministic, no RNG):

* threshold: the midpoint rule ``thr = (min + max) / 2`` over the luma
  plane. A flat image (min == max) yields an empty mask — the F5
  no-detection path.
* components: 4-connected components of ``luma > thr`` via vectorized
  iterative min-label propagation (each pass is a whole-array numpy
  op; passes needed = component graph diameter, small for the compact
  blobs this tier targets).
* boxes: per component — tight bbox (x2/y2 EXCLUSIVE, numpy-slice
  semantics like T6), pixel area, ``conf = (mean_inside −
  mean_outside) / 255`` at full precision (contrast against the rest
  of the image; presentation layers round via Spark F.round / DuckDB
  round so the oracle shares one rounding rule),
  ``cls = int(mean_inside) // 64`` (intensity-band class).
* ranking: boxes sorted by conf desc, then (y1, x1) for ties.
"""

from __future__ import annotations

import numpy as np

#: Components smaller than this many pixels are noise, not detections.
DEFAULT_MIN_AREA = 24




def midpoint_threshold(luma: np.ndarray) -> float:
    """``(min + max) / 2`` — flat images threshold to their own value,
    so ``luma > thr`` is empty and the image yields no detections."""
    lo = float(luma.min())
    hi = float(luma.max())
    return (lo + hi) / 2.0


def connected_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labels for a boolean mask.

    Returns ``(labels, n)`` where labels is int64 with 0 = background
    and components numbered 1..n in first-pixel (row-major) order.

    Vectorized min-label propagation: seed every foreground pixel with
    its own id, then repeatedly take the minimum over the 4-neighbor
    stencil until fixpoint. Each pass is whole-array numpy; the pass
    count is bounded by the largest component's internal path length
    (tiny for compact blobs; a pathological snake degrades to
    O(path) passes, never incorrect results).
    """
    h, w = mask.shape
    lab = np.where(
        mask, np.arange(1, h * w + 1, dtype=np.int64).reshape(h, w), 0
    )
    if not mask.any():
        return lab, 0
    big = np.int64(h * w + 1)
    while True:
        cur = np.where(lab > 0, lab, big)
        nxt = cur.copy()
        nxt[1:, :] = np.minimum(nxt[1:, :], cur[:-1, :])
        nxt[:-1, :] = np.minimum(nxt[:-1, :], cur[1:, :])
        nxt[:, 1:] = np.minimum(nxt[:, 1:], cur[:, :-1])
        nxt[:, :-1] = np.minimum(nxt[:, :-1], cur[:, 1:])
        nxt = np.where(mask, nxt, 0)
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    # renumber to 1..n in first-pixel order: component labels are the
    # min seed id, and seed ids are assigned row-major, so the sorted
    # unique order IS first-pixel order. One vectorized pass via
    # return_inverse (ADVICE r11: the old per-component `out[lab == v]`
    # scan was O(n_components × H × W))
    ids, inv = np.unique(lab, return_inverse=True)
    out = inv.reshape(lab.shape).astype(np.int64)
    if ids[0] != 0:  # no background pixel: shift components to 1..n
        out += 1
        return out, int(ids.size)
    return out, int(ids.size - 1)


def propose_boxes(
    luma: np.ndarray, min_area: int = DEFAULT_MIN_AREA
) -> list[dict]:
    """Threshold + components + confidence ranking over one grayscale
    frame. Returns ``[{x1,y1,x2,y2,area,conf,cls}, ...]`` sorted by
    conf desc (ties: y1, x1) — [] when nothing detected (F5)."""
    luma = np.asarray(luma)
    if luma.ndim == 3:  # HWC color: integer-mean luma
        luma = luma.astype(np.int64).sum(axis=2) // luma.shape[2]
    thr = midpoint_threshold(luma)
    mask = luma > thr
    lab, n = connected_components(mask)
    if n == 0:
        return []
    total = float(luma.sum())
    npx = luma.size
    boxes = []
    for c in range(1, n + 1):
        ys, xs = np.nonzero(lab == c)
        area = int(ys.size)
        if area < min_area:
            continue
        inside = float(luma[ys, xs].sum())
        mean_in = inside / area
        mean_out = (total - inside) / (npx - area) if npx > area else 0.0
        boxes.append(
            {
                "x1": int(xs.min()),
                "y1": int(ys.min()),
                "x2": int(xs.max()) + 1,  # exclusive, T6 slice semantics
                "y2": int(ys.max()) + 1,
                "area": area,
                # full precision on purpose: presentation layers round
                # via Spark F.round / DuckDB round so both sides of the
                # oracle share ONE rounding rule (repo policy)
                "conf": (mean_in - mean_out) / 255.0,
                "cls": int(mean_in) // 64,
            }
        )
    boxes.sort(key=lambda b: (-b["conf"], b["y1"], b["x1"]))
    return boxes


# --------------------------------------------------------------------
# Synthetic MRI-like fixture: piecewise-constant frames whose detector
# output is EXACTLY invertible in SQL (the DuckDB oracle re-derives
# boxes, confidences and crop bytes from the same integer arithmetic).
# Geometry guarantees: blob A lives entirely in rows [6, 47], blob B in
# rows [54, 91], so the two are always distinct 4-components; blob A is
# always above the midpoint threshold, blob B only when vb > (bg+va)/2.
# k % MRI_NO_BLOB_MOD == 0 renders a flat frame (the F5 path).
# --------------------------------------------------------------------
MRI_W = 96
MRI_H = 96
MRI_NO_BLOB_MOD = 11


def mri_params(k: int) -> dict:
    """Integer blob parameters for fixture id ``k`` (shared with the
    oracle SQL in queries/pipeline_queries.py — keep in lockstep)."""
    return {
        "bg": 16 + k % 13,
        "va": 160 + k % 60,
        "xa": 6 + (k * 7) % 50,
        "ya": 6 + (k * 11) % 24,
        "wa": 12 + k % 9,
        "ha": 10 + (k * 3) % 9,
        "vb": 96 + k % 30,
        "xb": 10 + (k * 5) % 50,
        "yb": 54 + (k * 13) % 24,
        "wb": 8 + k % 7,
        "hb": 8 + (k * 5) % 7,
    }


def render_mri_like(k: int) -> np.ndarray:
    """Render fixture frame ``k``: uniform background, bright blob A
    (the "tumor"), dimmer blob B (distractor), or a flat frame when
    ``k % MRI_NO_BLOB_MOD == 0``."""
    p = mri_params(k)
    arr = np.full((MRI_H, MRI_W), p["bg"], dtype=np.uint8)
    if k % MRI_NO_BLOB_MOD == 0:
        return arr
    arr[p["ya"]: p["ya"] + p["ha"], p["xa"]: p["xa"] + p["wa"]] = p["va"]
    arr[p["yb"]: p["yb"] + p["hb"], p["xb"]: p["xb"] + p["wb"]] = p["vb"]
    return arr
