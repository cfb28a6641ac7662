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


def test_upsert_index_stable_ids(spark, corpus_dir, labels):
    from oracle_vector_search_spark.api import upsert_index
    from oracle_vector_search_spark.sources.images import encode_fake_image

    index = build_index(spark, corpus_dir, labels)
    before = {r["id"]: (r["stem"], r["box_idx"]) for r in index.collect()}
    max_id = max(before)

    # batch: re-label img1 (different class, one box) + brand-new img9
    d = tempfile.mkdtemp(prefix="batch_")
    rng = np.random.RandomState(77)
    for stem in ("img1", "img9"):
        img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        with open(os.path.join(d, f"{stem}.fake"), "wb") as f:
            f.write(encode_fake_image(img))
    batch_labels = spark.createDataFrame(
        [
            ("img1", 1, "3 0.5 0.5 0.6 0.6"),
            ("img9", 1, "2 0.5 0.5 0.6 0.6"),
            ("img9", 2, "1 0.3 0.3 0.2 0.2"),
        ],
        "stem string, box_idx long, value string",
    )

    merged = upsert_index(spark, index, d, batch_labels)
    rows = merged.collect()
    by_key = {(r["stem"], r["box_idx"]): r for r in rows}

    # untouched stems keep their exact ids
    for oid, (stem, box_idx) in before.items():
        if stem not in ("img1", "img9"):
            assert by_key[(stem, box_idx)]["id"] == oid
    # re-labeled stem keeps its id, gets the new class
    old_img1_id = next(
        oid for oid, (s, b) in before.items() if s == "img1" and b == 1
    )
    assert by_key[("img1", 1)]["id"] == old_img1_id
    assert by_key[("img1", 1)]["class_id"] == 3
    # new stem's rows continue past the old max id, densely
    new_ids = sorted(
        r["id"] for r in rows if r["stem"] == "img9"
    )
    assert new_ids == [max_id + 1, max_id + 2]
    # stale extra box of a re-labeled stem does not survive
    img1_rows = [r for r in rows if r["stem"] == "img1"]
    assert len(img1_rows) == 1


def test_search_radius_contract(spark, corpus_dir, labels):
    """Radius search through the full image pipeline: every hit clears
    the threshold, and lowering the threshold can only ADD matches."""
    from oracle_vector_search_spark.api import search_radius

    with tempfile.TemporaryDirectory() as out:
        build_index(spark, corpus_dir, labels, out_path=f"{out}/index")
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
        tight = search_radius(spark, idx, queries, threshold=0.9)
        loose = search_radius(spark, idx, queries, threshold=0.2)
        t_rows = tight.collect()
        for r in t_rows:
            assert r["score"] >= 0.9
        t_pairs = {(r["query_stem"], r["match_id"]) for r in t_rows}
        l_pairs = {
            (r["query_stem"], r["match_id"]) for r in loose.collect()
        }
        assert t_pairs <= l_pairs


def test_search_auto_stays_exact_above_cutover(spark, corpus_dir, labels):
    """ADVICE r6 medium: tier="auto" must NEVER silently degrade to the
    approximate LSH path. Above ANN_CUTOVER_QUERIES (driven via the
    ``n_queries`` override so the routing decision — not fixture size —
    is under test) "auto" routes to the exact streaming expression tier
    and returns rows identical to tier="expr". The ANN path remains an
    explicit ``tier="ann"`` opt-in with the same output contract."""
    from oracle_vector_search_spark.api import (
        ANN_CUTOVER_QUERIES,
        search,
    )

    with tempfile.TemporaryDirectory() as out:
        build_index(spark, corpus_dir, labels, out_path=f"{out}/index")
        idx = load_index(spark, f"{out}/index")
        queries = spark.createDataFrame(
            [
                (
                    f"q_img{i}",
                    f"q/img{i}.fake",
                    open(
                        os.path.join(corpus_dir, f"img{i}.fake"), "rb"
                    ).read(),
                )
                for i in (1, 4)
            ],
            "stem string, path string, content binary",
        )
        routed = search(
            spark, idx, queries, k=3,
            n_queries=ANN_CUTOVER_QUERIES + 1,
        )
        rows = routed.collect()
        assert {r["query_stem"] for r in rows} <= {"q_img1", "q_img4"}
        for r in rows:
            assert 1 <= r["rank"] <= 3
            assert r["score"] is not None
        # auto above the cutover == exact expr tier, row for row
        exact = search(spark, idx, queries, k=3, tier="expr").collect()
        triple = lambda r: (r["query_stem"], r["rank"], r["match_id"])  # noqa: E731
        assert sorted(map(triple, rows)) == sorted(map(triple, exact))
        # ANN is still available — but only as an explicit opt-in
        forced = search(spark, idx, queries, k=3, tier="ann").collect()
        assert {r["query_stem"] for r in forced} <= {"q_img1", "q_img4"}
        for r in forced:
            assert 1 <= r["rank"] <= 3
            assert r["score"] is not None


def test_live_results_coexist_across_invocations(spark, corpus_dir, labels):
    """VERDICT r13 #1 regression guard: every public entry point must
    return a lazily-collectable result whose blocks SURVIVE later
    invocations of the same (and sibling) entry points. r13 pinned the
    query pipeline under a static keyed_local_checkpoint key, so the
    second call released the first result's only blocks and collecting
    the older frame died with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Here
    we build N live results from search (expr, gemm, ann tiers) and
    search_radius BEFORE collecting any, then collect OLDEST-FIRST —
    the order that crashes under keyed pinning."""
    from oracle_vector_search_spark.api import search_radius

    with tempfile.TemporaryDirectory() as out:
        build_index(spark, corpus_dir, labels, out_path=f"{out}/index")
        idx = load_index(spark, f"{out}/index")
        queries = spark.createDataFrame(
            [
                (
                    f"q_img{i}",
                    f"q/img{i}.fake",
                    open(
                        os.path.join(corpus_dir, f"img{i}.fake"), "rb"
                    ).read(),
                )
                for i in (1, 4)
            ],
            "stem string, path string, content binary",
        )
        live = [
            ("search:expr#1", search(spark, idx, queries, k=3, tier="expr")),
            ("search:expr#2", search(spark, idx, queries, k=2, tier="expr")),
            ("search:gemm", search(spark, idx, queries, k=3, tier="gemm")),
            ("search:ann", search(spark, idx, queries, k=3, tier="ann")),
            ("radius#1", search_radius(spark, idx, queries, threshold=0.2)),
            ("radius#2", search_radius(spark, idx, queries, threshold=0.9)),
        ]
        # collect oldest-first: under a static keyed pin every frame
        # except the newest per entry point is already dead here
        for name, df in live:
            rows = df.collect()  # must not raise
            assert {r["query_stem"] for r in rows} <= {
                "q_img1",
                "q_img4",
            }, name
        # expr results stay self-consistent after all later invocations
        k3 = {(r["query_stem"], r["rank"], r["match_id"])
              for r in live[0][1].collect()}
        k2 = {(r["query_stem"], r["rank"], r["match_id"])
              for r in live[1][1].collect()}
        assert k2 <= k3
