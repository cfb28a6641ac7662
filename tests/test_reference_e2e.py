"""END-TO-END build over the reference's REAL image+label files.

With the numpy baseline-JPEG tier wired into ``_decode_one``, the full
``build_index`` pipeline — binaryFile scan → REAL pixel decode →
preprocess → YOLO parse → denormalize → numpy-slice crop → hash
embed → dense ids — runs on the reference's actual shipped data with
zero optional deps. This closes the last S2/T6/T8 evidence gap:
previously real bytes stopped at SOF-header parsing.

Expectations are derived INDEPENDENTLY from the label files (the
reference's box arithmetic, build_faiss_db.py:183-188), so the test
verifies the pixel path against ground truth, not against itself.
A deterministic 20-image subset keeps it CI-sized (~0.5 s/image
decode); `reference_crops_decode_parity` covers all 2,472 crops in
the oracle gate.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

_REF = "/root/reference/data/processed/Brain_MRI_GammaBlur/train"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference data not present"
)


def _subset_stems(n=20):
    files = sorted(glob.glob(f"{_REF}/images/*.jpg"))
    # deterministic spread across the alphabet (classes interleave)
    step = max(1, len(files) // n)
    return [
        os.path.splitext(os.path.basename(p))[0] for p in files[::step]
    ][:n]


def _expected_boxes(stems):
    """Replay build_faiss_db.py:183-188 in plain python over the real
    label files: int() truncation, numpy-slice kept-crop rule."""
    out = {}
    for stem in stems:
        path = f"{_REF}/labels/{stem}.txt"
        if not os.path.exists(path):
            continue
        boxes = []
        with open(path) as f:
            for i, line in enumerate(f.readlines()):
                parts = line.strip().split()
                if len(parts) != 5:
                    continue
                cid = int(parts[0])
                xc, yc, w, h = map(float, parts[1:])
                w_abs, h_abs = int(w * 640), int(h * 640)
                x1 = int(xc * 640 - w_abs / 2)
                y1 = int(yc * 640 - h_abs / 2)
                x2, y2 = x1 + w_abs, y1 + h_abs

                def eff(v):
                    return min(max(v + 640 if v < 0 else v, 0), 640)

                if eff(x2) > eff(x1) and eff(y2) > eff(y1):
                    boxes.append((i, cid, eff(x2) - eff(x1),
                                  eff(y2) - eff(y1)))
        if boxes:
            out[stem] = boxes
    return out


def test_build_index_on_real_reference_images(spark):
    from oracle_vector_search_spark.api import build_index

    stems = _subset_stems()
    expected = _expected_boxes(stems)
    assert len(expected) >= 15  # the subset must be non-trivial

    images = spark.createDataFrame(
        [
            (
                stem,
                f"{_REF}/images/{stem}.jpg",
                open(f"{_REF}/images/{stem}.jpg", "rb").read(),
            )
            for stem in expected
        ],
        "stem string, path string, content binary",
    )
    label_rows = []
    for stem in expected:
        with open(f"{_REF}/labels/{stem}.txt") as f:
            for i, line in enumerate(f.readlines()):
                label_rows.append((stem, i, line.strip()))
    labels = spark.createDataFrame(
        label_rows, "stem string, box_idx long, value string"
    )

    index = build_index(spark, images, labels, preprocess="none")
    rows = index.collect()

    # every label-derived kept box produced exactly one index row
    exp_n = sum(len(v) for v in expected.values())
    assert len(rows) == exp_n, (len(rows), exp_n)
    by_stem = {}
    for r in rows:
        by_stem.setdefault(r["stem"], []).append(r)
    assert set(by_stem) == set(expected)
    for stem, boxes in expected.items():
        got_idx = sorted(r["box_idx"] for r in by_stem[stem])
        assert got_idx == sorted(b[0] for b in boxes)
        got_cls = {r["box_idx"]: r["class_id"] for r in by_stem[stem]}
        for (i, cid, _, _) in boxes:
            assert got_cls[i] == cid

    # real-pixel embeddings: present, fixed-dim, non-degenerate
    embs = [r["embedding"] for r in rows]
    assert all(e is not None and len(e) == 8 for e in embs)
    assert len({tuple(e) for e in embs}) > len(embs) // 2

    # dense deterministic ids
    ids = sorted(r["id"] for r in rows)
    assert ids == list(range(1, exp_n + 1))


def test_real_image_decode_dims(spark):
    """S2 on real 640x640 JPEGs: decoded pixel dims equal the SOF
    header dims for every subset image."""
    from oracle_vector_search_spark.sources.images import decode_images

    stems = _subset_stems(8)
    images = spark.createDataFrame(
        [
            (
                stem,
                f"{_REF}/images/{stem}.jpg",
                open(f"{_REF}/images/{stem}.jpg", "rb").read(),
            )
            for stem in stems
        ],
        "stem string, path string, content binary",
    )
    decoded = decode_images(images).filter(
        F.col("pixels").isNotNull()
    )
    rows = decoded.select("stem", "width", "height", "channels").collect()
    assert len(rows) == len(stems)
    for r in rows:
        assert (r["width"], r["height"], r["channels"]) == (640, 640, 3)
