"""Q=70k search through the PUBLIC facade at the historical ANN
cutover (VERDICT r6 #7): measured wall + plan fingerprint for the
routed path.

Since round 7 ``tier="auto"`` stays exact above the cutover (ADVICE r6
medium): ``knn.choose_knn_tier`` routes Q > GEMM_MAX_QUERIES to the
expression tier, whose scoring join broadcasts the (small) query-
embedding matrix and streams the index side map-only — the only exact
plan with no driver collect of the query set. Two tiers of test:

* ``test_routed_plan_fingerprint`` (always on): tiny fixture, routing
  forced via the ``n_queries`` override — asserts the PHYSICAL plan of
  the oversize route is the expression tier (BroadcastNestedLoopJoin
  scoring, no CartesianProduct, no driver collect).
* ``test_facade_search_at_70k`` (``OVS_SCALE_STRESS=1``, same switch
  as the propagation/dedup/graph probes): 70,000 real FAKEIMG uploads
  through the full public ``search()`` pipeline — decode → preprocess
  → detect → crop → embed → exact top-5 against a reference-sized
  index — with the wall printed and the result cross-checked row-for-
  row against the independently-implemented GEMM tier on a sample.
  Measured walls live in PERF.md ("facade at the cutover").

Reference scope: the reference serves ONE upload per interaction
(app.py:100-156, a single st.file_uploader image); Q=70k is this
engine's batch extension of that same online path.
"""

from __future__ import annotations

import os
import struct
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.api import search
from oracle_vector_search_spark.operators.knn import GEMM_MAX_QUERIES
from oracle_vector_search_spark.sources.images import FAKE_MAGIC

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"

N_QUERIES = 70_000  # > GEMM_MAX_QUERIES=65_536 → expression tier
N_INDEX = 2_472  # the reference corpus size (SURVEY §1: 2,472 crops)
DIMS = 8
SAMPLE = 128  # cross-tier verification sample


def _fake_query_images(spark, n: int):
    """n deterministic FAKEIMG uploads, generated ON THE EXECUTORS
    (stem, path, content) — no driver-side image loop; content varies
    per stem so detector conf / embeddings differ across queries."""

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState(i % (2**31 - 1))
                arr = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
                h, w, c = arr.shape
                content = (
                    FAKE_MAGIC
                    + struct.pack("<III", w, h, c)
                    + arr.tobytes()
                )
                rows.append(
                    (f"q{i:06d}", f"mem/q{i:06d}.fake", content)
                )
            yield pd.DataFrame(
                rows, columns=["stem", "path", "content"]
            )

    return spark.range(n).repartition(32).mapInPandas(
        gen, "stem string, path string, content binary"
    )


def _synthetic_index(spark, n: int, dims: int):
    """Index with the load_index schema (id, stem, split, class_id,
    class_name, embedding) — embeddings are deterministic column
    expressions, so the table is born distributed."""
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("img"), F.col("id")).alias("stem"),
        F.lit("train").alias("split"),
        (F.col("id") % 4).cast("int").alias("class_id"),
        F.concat(F.lit("class_"), (F.col("id") % 4).cast("string")).alias(
            "class_name"
        ),
        F.array(
            *[
                F.sin(F.col("id").cast("double") * F.lit(float(j) + 1.5))
                for j in range(dims)
            ]
        ).alias("embedding"),
    )


def test_routed_plan_fingerprint(spark):
    """The oversize-Q route (forced via n_queries, so fixture size
    stays tiny) must be the expression tier physically: scoring is a
    BroadcastNestedLoopJoin (query matrix broadcast, index streamed) +
    one window — never a CartesianProduct, never a driver collect of
    the query set (which the GEMM tier would do at line knn.py:192)."""
    idx = _synthetic_index(spark, 64, DIMS)
    queries = _fake_query_images(spark, 2)
    routed = search(
        spark, idx, queries, k=3, n_queries=GEMM_MAX_QUERIES + 1
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    rows = routed.collect()
    assert {r["query_stem"] for r in rows} == {"q000000", "q000001"}
    for r in rows:
        assert 1 <= r["rank"] <= 3 and r["score"] is not None


@pytest.mark.skipif(
    not STRESS, reason="set OVS_SCALE_STRESS=1 for the Q=70k facade run"
)
def test_facade_search_at_70k(spark):
    """VERDICT r6 #7: the routed path exercised AT its cutover, not
    just dispatch-tested — 70k uploads through the whole public
    pipeline, wall measured, results cross-checked against the GEMM
    tier (an independent implementation) on a deterministic sample."""
    idx = _synthetic_index(spark, N_INDEX, DIMS).persist()
    idx.count()
    queries = _fake_query_images(spark, N_QUERIES)

    t0 = time.time()
    res = search(spark, idx, queries, k=5)  # auto: counts, routes expr
    res = res.persist()
    n = res.count()
    wall = time.time() - t0
    print(
        f"\n[facade-70k] Q={N_QUERIES} x index={N_INDEX} k=5 "
        f"auto(expr) wall={wall:.1f}s rows={n}"
    )
    # every upload decodes (FAKEIMG), the stub detector always fires,
    # every crop embeds → exactly k rows per query
    assert n == N_QUERIES * 5

    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan

    ranks = res.groupBy("rank").count().collect()
    assert {r["rank"]: r["count"] for r in ranks} == {
        i: N_QUERIES for i in range(1, 6)
    }

    # cross-tier verification: the GEMM tier re-runs the same pipeline
    # on a sample of the SAME uploads; (stem, rank, match, score) must
    # agree exactly (both tiers round scores to 6 and tie-break by id)
    stride = N_QUERIES // SAMPLE
    sample_stems = [f"q{i * stride:06d}" for i in range(SAMPLE)]
    sample_q = queries.filter(F.col("stem").isin(sample_stems))
    gemm = search(spark, idx, sample_q, k=5, tier="gemm")
    key = lambda r: (  # noqa: E731
        r["query_stem"],
        r["rank"],
        r["match_id"],
        r["score"],
    )
    got = sorted(
        key(r)
        for r in res.filter(
            F.col("query_stem").isin(sample_stems)
        ).collect()
    )
    want = sorted(key(r) for r in gemm.collect())
    assert got == want
    res.unpersist()
    idx.unpersist()
