"""Golden pipeline test (SURVEY.md §5.4): the reference's build
dataflow over synthetic FAKEIMG images with planted F1-F6 violations.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.operators.ingest import (
    assign_index_ids,
    decode_class,
    denormalize_boxes,
    parse_yolo_labels,
)
from oracle_vector_search_spark.sources.images import (
    crop_boxes,
    decode_images,
    detect_boxes,
    embed_crops,
    encode_fake_image,
    preprocess_images,
    _blur3,
    _gamma_lut,
)


def _img(seed: int, w: int = 16, h: int = 12) -> bytes:
    rng = np.random.RandomState(seed)
    return encode_fake_image(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))


@pytest.fixture(scope="module")
def fixture_frames(spark):
    # FIXTURES.md table 12: one undecodable (F3), one label-less stem (F2)
    images = spark.createDataFrame(
        [
            ("a", "data/a.jpg", _img(1)),
            ("b", "data/b.jpg", _img(2)),
            ("c", "data/c.jpg", b"NOTANIMAGE"),  # F3: undecodable
            ("d", "data/d.jpg", _img(4)),  # F2: no label row
        ],
        "stem string, path string, content binary",
    )
    # FIXTURES.md table 11: malformed line (F6), empty box (F4), multi-box
    labels = spark.createDataFrame(
        [
            ("a", 1, "0 0.5 0.5 0.6 0.6"),
            ("a", 2, "1 0.25 0.25 0.2 0.2"),  # multi-box stem
            ("b", 1, "2 0.5 0.5"),  # F6: malformed
            ("b", 2, "3 0.26 0.5 0.0001 0.5"),  # F4: empty after floor
            ("b", 3, "1 0.5 0.5 0.4 0.4"),
            ("c", 1, "0 0.5 0.5 0.5 0.5"),  # image undecodable → dropped
        ],
        "stem string, box_idx long, value string",
    )
    return images, labels


def _build(spark, images, labels):
    decoded = decode_images(images).filter(F.col("pixels").isNotNull())
    pre = preprocess_images(decoded, mode="gamma_blur")
    parsed = parse_yolo_labels(labels, passthrough=["box_idx"])
    boxes = denormalize_boxes(
        parsed.join(pre.select("stem", "width", "height"), "stem")
    ).select("stem", "box_idx", "class_id", "x1", "y1", "x2", "y2")
    joined = boxes.join(pre, "stem")
    crops = crop_boxes(joined)
    embedded = embed_crops(crops.filter(F.col("crop").isNotNull()))
    embedded = decode_class(embedded)
    embedded = embedded.withColumn("split", F.lit("train"))
    return assign_index_ids(
        embedded, ["split", "stem", "box_idx"]
    ).select("id", "stem", "box_idx", "class_id", "class_name", "embedding")


def test_pipeline_drop_rules_and_golden(spark, fixture_frames):
    images, labels = fixture_frames
    rows = _build(spark, *fixture_frames).collect()
    # survivors: a/1, a/2, b/3 — everything else dropped by F2/F3/F4/F6
    assert [(r["stem"], r["box_idx"]) for r in rows] == [
        ("a", 1),
        ("a", 2),
        ("b", 3),
    ]
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert rows[0]["class_name"] == "glioma tumor"
    assert rows[1]["class_name"] == "meningioma tumor"
    # embeddings are unit-norm deterministic vectors
    for r in rows:
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-9


def test_pipeline_stable_under_repartition(spark, fixture_frames):
    images, labels = fixture_frames
    a = _build(spark, images, labels).collect()
    b = _build(spark, images.repartition(7), labels.repartition(5)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_gamma_lut_matches_reference_formula():
    lut = _gamma_lut(1.5)
    i = np.arange(256)
    expect = np.clip(((i / 255.0) ** (1 / 1.5)) * 255.0, 0, 255).astype(
        np.uint8
    )
    assert (lut == expect).all()


def test_blur_preserves_constant_image():
    arr = np.full((8, 8, 3), 77, dtype=np.uint8)
    assert (_blur3(arr) == arr).all()


def test_detector_stub_shapes(spark, fixture_frames):
    images, _ = fixture_frames
    decoded = decode_images(images).filter(F.col("pixels").isNotNull())
    dets = detect_boxes(decoded).collect()
    assert len(dets) == 3  # one per decodable image
    for d in dets:
        assert 0.0 <= d["conf"] <= 1.0
        assert d["x2"] > d["x1"] and d["y2"] > d["y1"]


def test_query_path_top1_is_argmax(spark, fixture_frames):
    """A1: best box per image = max_by(conf) — app.py:121-125."""
    images, _ = fixture_frames
    decoded = decode_images(images).filter(F.col("pixels").isNotNull())
    dets = detect_boxes(decoded)
    best = (
        dets.groupBy("stem")
        .agg(F.max_by(F.struct("x1", "y1", "x2", "y2", "cls"), "conf"))
        .collect()
    )
    assert len(best) == 3


def test_cnn_preprocess_shapes(spark, fixture_frames):
    from oracle_vector_search_spark.sources.images import (
        cnn_preprocess,
        decode_images,
    )

    images, _ = fixture_frames
    decoded = decode_images(images).filter(F.col("pixels").isNotNull())
    out = cnn_preprocess(decoded, resize_to=16, crop_to=12).collect()
    assert len(out) == 3
    for r in out:
        assert (r["c"], r["h"], r["w"]) == (3, 12, 12)
        t = np.frombuffer(bytes(r["tensor"]), np.float32)
        assert t.shape[0] == 3 * 12 * 12
        assert np.isfinite(t).all()
