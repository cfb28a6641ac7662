"""T9 detector over REAL reference MRI pixels (no oracle possible —
there is no ground truth for a classical proposer on real scans; this
is the determinism/sanity layer on top of the invertible-fixture
oracle in query_path_detect_search).

Uses the reference's actual shipped images
(/root/reference/data/raw/Brain_MRI/*/images, decoded by the
dependency-free baseline-JPEG decoder) and asserts the detector's
CONTRACT on them: boxes in bounds with exclusive coords, min-area
respected, confidence-descending ranking, cls in the intensity-band
range, bit-identical output across runs, and agreement between the
pure-kernel path and the Spark operator path.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from oracle_vector_search_spark.functions.detect_numpy import (
    DEFAULT_MIN_AREA,
    propose_boxes,
)
from oracle_vector_search_spark.functions.jpeg_numpy import (
    decode_baseline_jpeg,
)

IMAGES = sorted(
    glob.glob("/root/reference/data/raw/Brain_MRI/valid/images/*.jpg")
)[:6]

pytestmark = pytest.mark.skipif(
    not IMAGES, reason="reference image snapshot not present"
)


def _decoded():
    out = []
    for p in IMAGES:
        with open(p, "rb") as fh:
            arr = decode_baseline_jpeg(fh.read())
        if arr is not None:
            out.append((os.path.basename(p), arr))
    return out


def test_detector_contract_on_real_scans():
    frames = _decoded()
    assert frames, "no reference image decoded"
    saw_boxes = 0
    for name, arr in frames:
        h, w = arr.shape[0], arr.shape[1]
        boxes = propose_boxes(arr)
        confs = [b["conf"] for b in boxes]
        assert confs == sorted(confs, reverse=True), name
        for b in boxes:
            assert 0 <= b["x1"] < b["x2"] <= w, (name, b)
            assert 0 <= b["y1"] < b["y2"] <= h, (name, b)
            assert b["area"] >= DEFAULT_MIN_AREA, (name, b)
            assert (b["x2"] - b["x1"]) * (b["y2"] - b["y1"]) >= b["area"]
            assert 0 <= b["cls"] <= 3, (name, b)
        saw_boxes += len(boxes)
    # real MRI scans are bright-tissue-on-black: the midpoint threshold
    # must find SOMETHING across six scans or the kernel is broken
    assert saw_boxes > 0


def test_detector_is_deterministic_on_real_scans():
    frames = _decoded()
    for name, arr in frames[:3]:
        assert propose_boxes(arr) == propose_boxes(arr), name


def test_spark_operator_matches_kernel_on_real_scans(spark):
    from oracle_vector_search_spark.sources.images import (
        detect_boxes_numpy,
    )

    frames = _decoded()[:3]
    rows = [
        (
            name,
            int(arr.shape[1]),
            int(arr.shape[0]),
            int(arr.shape[2]) if arr.ndim == 3 else 1,
            (arr if arr.ndim == 3 else arr[..., None]).tobytes(),
        )
        for name, arr in frames
    ]
    df = spark.createDataFrame(
        rows,
        "stem string, width int, height int, channels int, pixels binary",
    )
    got = {
        (r["stem"], r["box_idx"]): (
            r["x1"], r["y1"], r["x2"], r["y2"], r["area"], r["cls"]
        )
        for r in detect_boxes_numpy(df).collect()
    }
    want = {}
    for name, arr in frames:
        for i, b in enumerate(propose_boxes(arr)):
            want[(name, i)] = (
                b["x1"], b["y1"], b["x2"], b["y2"], b["area"], b["cls"]
            )
    assert got == want
