"""T9 deterministic detector kernel (functions/detect_numpy.py) —
pure-numpy unit tests, no Spark. The Spark wiring + oracle parity is
covered by query_path_detect_search (queries/pipeline_queries.py) and
the driver's CORRECTNESS gate; here we prove the kernel itself handles
shapes the analytically-invertible fixture never produces (L-shapes,
diagonal non-connectivity, merge-requiring U-shapes)."""

from __future__ import annotations

import numpy as np
import pytest

from oracle_vector_search_spark.functions.detect_numpy import (
    DEFAULT_MIN_AREA,
    MRI_NO_BLOB_MOD,
    connected_components,
    midpoint_threshold,
    mri_params,
    propose_boxes,
    render_mri_like,
)


def _mask(rows):
    return np.array([[c == "#" for c in r] for r in rows], dtype=bool)


class TestConnectedComponents:
    def test_empty_mask(self):
        lab, n = connected_components(np.zeros((4, 4), dtype=bool))
        assert n == 0 and not lab.any()

    def test_single_block(self):
        lab, n = connected_components(_mask(["....", ".##.", ".##.", "...."]))
        assert n == 1
        assert (lab > 0).sum() == 4

    def test_diagonal_is_not_connected(self):
        # 4-connectivity: diagonal touch = two components
        lab, n = connected_components(_mask(["#.", ".#"]))
        assert n == 2
        assert lab[0, 0] != lab[1, 1]

    def test_l_shape_single_component(self):
        lab, n = connected_components(
            _mask(["#...", "#...", "####"])
        )
        assert n == 1

    def test_u_shape_requires_label_merge(self):
        # the two arms seed different ids; the bottom bar must merge
        # them — the classic two-pass union case
        lab, n = connected_components(
            _mask(["#.#", "#.#", "###"])
        )
        assert n == 1
        assert len(np.unique(lab[lab > 0])) == 1

    def test_components_numbered_in_first_pixel_order(self):
        lab, n = connected_components(
            _mask(["##....", "......", "....##"])
        )
        assert n == 2
        assert lab[0, 0] == 1 and lab[2, 4] == 2

    def test_snake_converges(self):
        # serpentine path: worst case for min-propagation pass count —
        # must still converge to ONE component
        rows = []
        for i in range(9):
            if i % 2 == 0:
                rows.append("#" * 12)
            else:
                rows.append(
                    "#" + "." * 11 if (i // 2) % 2 == 0 else "." * 11 + "#"
                )
        lab, n = connected_components(_mask(rows))
        assert n == 1


class TestProposeBoxes:
    def test_flat_frame_no_detections(self):
        assert propose_boxes(np.full((32, 32), 40, dtype=np.uint8)) == []

    def test_min_area_filters_specks(self):
        arr = np.full((32, 32), 10, dtype=np.uint8)
        arr[4:6, 4:6] = 200  # 4 px — below DEFAULT_MIN_AREA
        arr[16:24, 16:24] = 200  # 64 px — keeps
        boxes = propose_boxes(arr)
        assert len(boxes) == 1
        b = boxes[0]
        assert (b["x1"], b["y1"], b["x2"], b["y2"]) == (16, 16, 24, 24)
        assert b["area"] == 64

    def test_exclusive_box_bounds_are_slice_semantics(self):
        arr = np.full((20, 20), 0, dtype=np.uint8)
        arr[3:7, 5:11] = 255
        b = propose_boxes(arr)[0]
        crop = arr[b["y1"]: b["y2"], b["x1"]: b["x2"]]
        assert crop.shape == (4, 6) and (crop == 255).all()

    def test_confidence_is_contrast_and_ranks_brighter_first(self):
        arr = np.full((40, 40), 20, dtype=np.uint8)
        arr[2:8, 2:10] = 220  # bright, 48 px
        arr[30:36, 30:38] = 130  # dim, 48 px — above (20+220)/2 = 120
        boxes = propose_boxes(arr)
        assert len(boxes) == 2
        assert boxes[0]["conf"] > boxes[1]["conf"]
        assert boxes[0]["y1"] == 2  # brighter box ranks first
        # closed-form check for the bright box
        total = arr.astype(np.int64).sum()
        inside = 220 * 48
        mean_out = (total - inside) / (1600 - 48)
        expected = (220 - mean_out) / 255.0
        assert boxes[0]["conf"] == pytest.approx(expected, abs=1e-6)

    def test_cls_is_intensity_band(self):
        arr = np.full((32, 32), 10, dtype=np.uint8)
        arr[4:12, 4:12] = 200
        assert propose_boxes(arr)[0]["cls"] == 200 // 64

    def test_hwc_color_input_uses_integer_mean_luma(self):
        arr = np.full((32, 32, 3), 10, dtype=np.uint8)
        arr[4:12, 4:12] = (250, 100, 100)  # mean 150
        b = propose_boxes(arr)[0]
        assert b["cls"] == 150 // 64
        assert (b["x1"], b["y1"]) == (4, 4)


class TestMriFixture:
    def test_no_blob_frames_are_flat(self):
        k = MRI_NO_BLOB_MOD * 2
        arr = render_mri_like(k)
        assert arr.min() == arr.max()
        assert propose_boxes(arr) == []

    def test_blob_a_always_detected_with_exact_box(self):
        for k in range(1, 60):
            if k % MRI_NO_BLOB_MOD == 0:
                continue
            p = mri_params(k)
            boxes = propose_boxes(render_mri_like(k))
            assert boxes, k
            a = boxes[0]
            assert (a["x1"], a["y1"]) == (p["xa"], p["ya"]), k
            assert (a["x2"], a["y2"]) == (
                p["xa"] + p["wa"], p["ya"] + p["ha"]), k
            assert a["area"] == p["wa"] * p["ha"]
            assert a["cls"] == p["va"] // 64

    def test_blob_b_detected_iff_above_midpoint_threshold(self):
        saw_detected = saw_missed = False
        for k in range(1, 120):
            if k % MRI_NO_BLOB_MOD == 0:
                continue
            p = mri_params(k)
            boxes = propose_boxes(render_mri_like(k))
            thr = (p["bg"] + p["va"]) / 2.0
            expect_b = p["vb"] > thr and p["wb"] * p["hb"] >= DEFAULT_MIN_AREA
            assert (len(boxes) == 2) == expect_b, k
            saw_detected |= expect_b
            saw_missed |= not expect_b
        # the fixture must exercise BOTH branches or the oracle check
        # of n_boxes proves nothing
        assert saw_detected and saw_missed

    def test_threshold_is_midpoint(self):
        k = 3
        p = mri_params(k)
        assert midpoint_threshold(render_mri_like(k)) == (
            (p["bg"] + p["va"]) / 2.0
        )


class TestSparkOperator:
    """detect_boxes_numpy through Spark (the UDTF seam the query path
    uses): NULL pixels skip (F3/F5), color frames decode, proposal
    rows carry the kernel's exact fields."""

    def test_detect_boxes_numpy_rows_and_f5(self, spark):
        import pandas as pd

        from oracle_vector_search_spark.functions.detect_numpy import (
            MRI_NO_BLOB_MOD,
            mri_params,
            render_mri_like,
        )
        from oracle_vector_search_spark.sources.images import (
            detect_boxes_numpy,
        )

        ks = [1, 2, MRI_NO_BLOB_MOD, 3]
        rows = [
            (
                f"q_{k}",
                96,
                96,
                1,
                render_mri_like(k).reshape(96, 96, 1).tobytes(),
            )
            for k in ks
        ] + [("broken", 96, 96, 1, None)]  # F3: undecodable
        df = spark.createDataFrame(
            rows,
            "stem string, width int, height int, channels int, "
            "pixels binary",
        )
        out = detect_boxes_numpy(df).collect()
        stems = {r["stem"] for r in out}
        assert "broken" not in stems  # NULL pixels → no rows
        assert f"q_{MRI_NO_BLOB_MOD}" not in stems  # flat frame → F5
        for k in (1, 2, 3):
            mine = [r for r in out if r["stem"] == f"q_{k}"]
            assert mine, k
            best = min(mine, key=lambda r: r["box_idx"])
            p = mri_params(k)
            assert (best["x1"], best["y1"]) == (p["xa"], p["ya"])
            assert best["cls"] == p["va"] // 64

    def test_detect_boxes_numpy_color_frames(self, spark):
        import numpy as np

        from oracle_vector_search_spark.sources.images import (
            detect_boxes_numpy,
        )

        arr = np.full((32, 32, 3), 10, dtype=np.uint8)
        arr[4:12, 4:12] = (250, 100, 100)  # integer-mean luma 150
        df = spark.createDataFrame(
            [("c", 32, 32, 3, arr.tobytes())],
            "stem string, width int, height int, channels int, "
            "pixels binary",
        )
        out = detect_boxes_numpy(df).collect()
        assert len(out) == 1
        assert out[0]["cls"] == 150 // 64
        assert (out[0]["x2"], out[0]["y2"]) == (12, 12)
