"""The fixed-weight numpy conv-net embedder (VERDICT r8 #7):
functions/convnet_numpy.py is a real conv/pool/normalize forward with
the torch tier's exact batching contract, so the shape-grouped /
per-executor-cached / F3-tolerant code path the ResNet tier uses runs
UNGATED in CI.

Layers: an independent SCALAR forward (python loops over the same
hash-derived weights) pins the vectorized kernel; frozen goldens pin
the weights themselves; batching tests prove composition-independence
(the property the torch tier's shape grouping relies on); a Spark
end-to-end run drives `embed_crops(tier="convnet")` through the same
FAKEIMG pipeline the hash tier uses.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.functions.convnet_numpy import (
    _F1,
    _MEAN,
    _STD,
    _WEIGHT_CACHE,
    convnet_embed_batch,
    convnet_forward,
    convnet_weights,
)

DIMS = 8


def _rand(h: int, w: int, seed: int) -> np.ndarray:
    return (
        np.random.RandomState(seed)
        .randint(0, 256, size=(h, w, 3))
        .astype(np.uint8)
    )


def _scalar_forward(img: np.ndarray, dims: int) -> np.ndarray:
    """Loop-based independent forward over the same weights — float32
    scalars in the kernel's documented (dy, dx, cin) accumulation
    order."""
    w1, b1, w2, b2 = convnet_weights(dims)
    f32 = np.float32
    h, w = img.shape[:2]
    x = np.empty((3, h, w), dtype=np.float32)
    for c in range(3):
        for y in range(h):
            for xx in range(w):
                x[c, y, xx] = (
                    img[y, xx, c].astype(np.float32) / f32(255.0)
                    - _MEAN[c]
                ) / _STD[c]

    def conv(xin, wgt, bias):
        cin, hh, ww = xin.shape
        cout = wgt.shape[0]
        out = np.empty((cout, hh - 2, ww - 2), dtype=np.float32)
        for o in range(cout):
            for y in range(hh - 2):
                for xx in range(ww - 2):
                    acc = bias[o]
                    for dy in range(3):
                        for dx in range(3):
                            for c in range(cin):
                                acc = f32(
                                    acc
                                    + xin[c, y + dy, xx + dx]
                                    * wgt[o, c, dy, dx]
                                )
                    out[o, y, xx] = max(acc, f32(0.0))
        return out

    a = conv(x, w1, b1)
    c, hh, ww = a.shape
    p = np.empty((c, hh // 2, ww // 2), dtype=np.float32)
    for o in range(c):
        for y in range(hh // 2):
            for xx in range(ww // 2):
                p[o, y, xx] = max(
                    a[o, 2 * y, 2 * xx],
                    a[o, 2 * y, 2 * xx + 1],
                    a[o, 2 * y + 1, 2 * xx],
                    a[o, 2 * y + 1, 2 * xx + 1],
                )
    b = conv(p, w2, b2)
    feat = b.mean(axis=(1, 2), dtype=np.float32)
    nrm = f32(np.sqrt(np.float32((feat * feat).sum(dtype=np.float32))))
    return feat / (nrm if nrm != 0 else f32(1.0))


def test_weights_deterministic_and_cached() -> None:
    _WEIGHT_CACHE.clear()
    w1a, b1a, w2a, b2a = convnet_weights(DIMS)
    assert w1a.shape == (_F1, 3, 3, 3) and w2a.shape == (DIMS, _F1, 3, 3)
    w1b, *_ = convnet_weights(DIMS)
    assert w1a is w1b  # per-process cache, like the torch singleton
    # frozen weight goldens (hash-derived — change means drift)
    assert round(float(w1a[0, 0, 0, 0]), 6) == -0.318359
    assert round(float(b1a[0]), 6) == -0.267578
    assert round(float(w2a[0, 0, 0, 0]), 6) == -0.373047


def test_vectorized_equals_scalar() -> None:
    for h, w, seed in [(9, 9, 1), (12, 16, 2), (8, 31, 3)]:
        img = _rand(h, w, seed)
        vec = convnet_forward(img[None], DIMS)[0]
        ref = _scalar_forward(img, DIMS)
        assert np.allclose(vec, ref, rtol=0, atol=2e-6), (h, w)
        # unit norm
        assert abs(float((vec * vec).sum()) - 1.0) < 1e-5


def test_batch_composition_independence() -> None:
    # the shape-grouping contract: embedding of an image is identical
    # whether it runs alone or stacked with same-shape neighbors
    imgs = [_rand(10, 14, s) for s in range(6)]
    batch = convnet_forward(np.stack(imgs), DIMS)
    for i, img in enumerate(imgs):
        solo = convnet_forward(img[None], DIMS)[0]
        assert np.array_equal(batch[i], solo), i


def test_embed_batch_groups_and_f3() -> None:
    arrays = [
        _rand(10, 14, 1),
        None,  # undecodable → None through
        _rand(8, 8, 2),
        _rand(10, 14, 3),  # same shape as [0] → one stacked forward
        _rand(3, 50, 4),  # min side < 7 → None (receptive field)
    ]
    out = convnet_embed_batch(arrays, DIMS)
    assert out[1] is None and out[4] is None
    assert all(len(e) == DIMS for e in (out[0], out[2], out[3]))
    solo = convnet_forward(arrays[3][None], DIMS)[0]
    assert out[3] == [float(v) for v in solo]


def test_embed_crops_convnet_tier_end_to_end(spark) -> None:
    from oracle_vector_search_spark.operators.ingest import (
        denormalize_boxes,
        parse_yolo_labels,
    )
    from oracle_vector_search_spark.sources.images import (
        crop_boxes,
        decode_images,
        embed_crops,
        encode_fake_image,
    )

    images = spark.createDataFrame(
        [
            ("a", "d/a.jpg", encode_fake_image(_rand(24, 32, 1))),
            ("b", "d/b.jpg", encode_fake_image(_rand(24, 32, 2))),
        ],
        "stem string, path string, content binary",
    )
    labels = spark.createDataFrame(
        [("a", 1, "0 0.5 0.5 0.5 0.5"), ("b", 1, "1 0.5 0.5 0.75 0.75")],
        "stem string, box_idx long, value string",
    )
    decoded = decode_images(images)
    parsed = parse_yolo_labels(labels, passthrough=["box_idx"])
    boxes = denormalize_boxes(
        parsed.join(decoded.select("stem", "width", "height"), "stem")
    ).select("stem", "box_idx", "class_id", "x1", "y1", "x2", "y2")
    crops = crop_boxes(
        boxes.join(decoded, "stem").filter(F.col("pixels").isNotNull())
    ).filter(F.col("crop").isNotNull())
    rows = {
        r["stem"]: r["embedding"]
        for r in embed_crops(crops, dims=DIMS, tier="convnet").collect()
    }
    assert set(rows) == {"a", "b"}
    for stem, emb in rows.items():
        assert len(emb) == DIMS
        assert abs(sum(v * v for v in emb) - 1.0) < 1e-5
    # and the result matches driving the kernel directly on the crop
    crop_rows = crops.select("stem", "x1", "y1", "x2", "y2", "crop").collect()
    for r in crop_rows:
        h, w = r["y2"] - r["y1"], r["x2"] - r["x1"]
        arr = np.frombuffer(bytes(r["crop"]), np.uint8).reshape(h, w, 3)
        expect = convnet_forward(arr[None], DIMS)[0]
        assert rows[r["stem"]] == [float(v) for v in expect]


def test_unknown_tier_rejected(spark) -> None:
    from oracle_vector_search_spark.sources.images import embed_crops

    df = spark.createDataFrame(
        [], "stem string, box_idx long, class_id int, x1 int, y1 int,"
        " x2 int, y2 int, crop binary"
    )
    with pytest.raises(ValueError, match="unknown embed tier"):
        embed_crops(df, tier="resnet9000")
