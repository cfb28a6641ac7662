"""Dedup-cascade stress at generated scale (VERDICT r4 #6).

The oracle corpus proves the cascade CORRECT at fixture size; this test
proves the same code path HOLDS UP structurally at orders of magnitude
more documents, with a corpus generated in-session (deterministic
column expressions — no fixture files touched):

    group g = three consecutive doc_ids:
      3g   → base text (20 tokens from a 5000-word hash vocab)
      3g+1 → EXACT copy of the base
      3g+2 → NEAR copy (base + one extra token)

so the expected component structure is known by construction: every
group must collapse to canonical id 3g, and the fixpoint must converge
in O(1) rounds (component diameter 2). The default CI size is 100k
docs (~seconds); the 1M-doc tier runs when OVS_SCALE_STRESS=1 and its
measured wall-clock curve is recorded in PERF.md §"cascade scaling".
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.operators.dedup import (
    dedup_clusters_fixpoint,
    minhash_near_dup,
)

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"


def synth_corpus(spark, n_docs: int):
    """Deterministic n_docs-row corpus with planted exact+near dups.

    Token stream is derived from the GROUP id via xxhash64, so the two
    copies reproduce the base text bit-exactly without any join, and
    distinct groups collide only by 64-bit hash accident."""
    d = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 3).cast("long").alias("g"),
        (F.col("id") % 3).alias("variant"),
    )
    base_text = F.expr(
        "concat_ws(' ', transform(sequence(1, 20), "
        "i -> concat('w', pmod(xxhash64(g * 131071 + i), 5000))))"
    )
    text = F.when(F.col("variant") == 2,
                  F.concat(base_text, F.lit(" x"),
                           (F.col("g") % 5).cast("string"))
                  ).otherwise(base_text)
    return d.select("doc_id", "g", text.alias("text"))


def run_cascade(spark, n_docs: int) -> dict:
    corpus = synth_corpus(spark, n_docs).repartition(32, "doc_id")
    t0 = time.time()
    pairs = minhash_near_dup(corpus, threshold=0.4)
    labels = dedup_clusters_fixpoint(
        pairs, corpus.select("doc_id"), max_iterations=8
    )
    joined = labels.withColumn(
        "expected_max", (F.col("doc_id") / 3).cast("long") * 3
    )
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("canonical_id") > F.col("expected_max")).cast("long")
        ).alias("n_violations"),
        F.countDistinct("canonical_id").alias("n_components"),
    ).collect()[0]
    wall = time.time() - t0
    return {
        "n_docs": agg["n"],
        "n_violations": agg["n_violations"],
        "n_components": agg["n_components"],
        "wall_sec": round(wall, 1),
    }


@pytest.mark.parametrize("n_docs", [100_000] + ([1_000_000] if STRESS else []))
def test_cascade_holds_at_scale(spark, n_docs):
    r = run_cascade(spark, n_docs)
    n_groups = n_docs // 3 + (1 if n_docs % 3 else 0)
    assert r["n_docs"] == n_docs
    # Exact copies (J=1) are ALWAYS caught; the near copy (J≈0.9) has a
    # known LSH miss probability of (1 - 0.9^4)^4 ≈ 1.4% per band
    # table minus the extra chances from bucketing with the exact copy —
    # measured ≈0.1-0.3% here. Violations (a doc not reaching its group
    # head) must stay within that envelope: LSH recall physics, not a
    # pipeline bug, and the exact-Jaccard verify means false MERGES
    # require a 64-bit hash collision (asserted by the lower bound).
    assert r["n_violations"] <= n_groups * 0.01, r
    assert n_groups * 0.999 <= r["n_components"] <= n_groups * 1.01, r


def test_fixpoint_plan_stays_flat(spark):
    """The per-round localCheckpoint must keep the label plan CONSTANT
    size — an unbounded lineage is what kills iterative jobs at scale."""
    corpus = synth_corpus(spark, 3_000).repartition(8, "doc_id")
    pairs = minhash_near_dup(corpus, threshold=0.4)
    labels = dedup_clusters_fixpoint(
        pairs, corpus.select("doc_id"), max_iterations=8
    )
    plan = labels._jdf.queryExecution().executedPlan().toString()
    # a checkpointed frame scans its materialized RDD: shallow plan
    assert len(plan.splitlines()) < 15, plan
