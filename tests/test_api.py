"""End-to-end API test: the reference's full build → search lifecycle
over real files on disk."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.api import build_index, load_index, search
from oracle_vector_search_spark.sources.images import encode_fake_image


@pytest.fixture(scope="module")
def corpus_dir(spark):
    d = tempfile.mkdtemp(prefix="corpus_")
    rng = np.random.RandomState(11)
    for i in range(6):
        img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        with open(os.path.join(d, f"img{i}.fake"), "wb") as f:
            f.write(encode_fake_image(img))
    return d


@pytest.fixture(scope="module")
def labels(spark):
    rows = []
    for i in range(6):
        rows.append((f"img{i}", 1, f"{i % 4} 0.5 0.5 0.6 0.6"))
        if i % 3 == 0:
            rows.append((f"img{i}", 2, f"{(i + 1) % 4} 0.3 0.3 0.2 0.2"))
    return spark.createDataFrame(
        rows, "stem string, box_idx long, value string"
    )


def test_build_search_lifecycle(spark, corpus_dir, labels):
    with tempfile.TemporaryDirectory() as out:
        index = build_index(
            spark, corpus_dir, labels, out_path=f"{out}/index"
        )
        n = index.count()
        assert n == 8  # 6 single-box + 2 extra boxes
        assert index.filter(F.col("class_name").isNull()).count() == 0

        # reload like a fresh session and search with 2 of the corpus
        # images as "uploads" (query crops come from the detector, index
        # crops from labels, so exact self-match is not guaranteed —
        # assertions cover shape/ranking contract)
        idx = load_index(spark, f"{out}/index")
        queries = spark.createDataFrame(
            [
                (
                    f"q_img{i}",
                    f"q/img{i}.fake",
                    open(os.path.join(corpus_dir, f"img{i}.fake"), "rb").read(),
                )
                for i in (1, 4)
            ],
            "stem string, path string, content binary",
        )
        res = search(spark, idx, queries, k=3)
        rows = res.collect()
        assert {r["query_stem"] for r in rows} == {"q_img1", "q_img4"}
        for r in rows:
            assert 1 <= r["rank"] <= 3
            assert r["class_name"] is not None
            assert r["score"] is not None


def test_search_no_detection_is_dropped_not_fatal(spark, corpus_dir, labels):
    with tempfile.TemporaryDirectory() as out:
        index = build_index(spark, corpus_dir, labels, f"{out}/index")
        bad = spark.createDataFrame(
            [("broken", "q/broken.fake", b"NOTIMG")],
            "stem string, path string, content binary",
        )
        res = search(spark, load_index(spark, f"{out}/index"), bad, k=3)
        assert res.count() == 0  # F3/F5: dropped, no exception
