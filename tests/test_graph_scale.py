"""Scale evidence for the WCC (min-label fixpoint) and k-core (peel)
kernels: round cost is graph-sized, plans stay flat across rounds, and
results are EXACT on a synthetic graph with known structure.

Design (VERDICT r6 #5 — extend the label-propagation scale pattern):
the graph is a disjoint union of size-``C`` components laid out on
``range(n)``: component c owns nodes [cC, (c+1)C); chain edges
(i, i+1) stay inside the component; EVEN components additionally close
the ring. Everything is derived from ``spark.range`` arithmetic —
rand()-free and partitioning-independent — so the assertions are
exact, not statistical:

* WCC: every node's canonical id is its component minimum ``c*C``; the
  fixpoint needs exactly diameter ≈ C rounds REGARDLESS of n (the
  100 TB property: rounds scale with component diameter, each round's
  shuffle with edge count).
* k-core (k=2): ring components survive peeling entirely, chain
  components dissolve (endpoints have degree 1; peeling cascades in
  ceil(C/2) rounds) — in_core iff the component is even.

Always-on tier: 100k nodes. A 1M-node tier runs when
``OVS_SCALE_STRESS=1`` (same switch as the propagation/dedup probes);
the stress run's wall numbers feed the PERF.md round-cost table.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.operators.dedup import (
    dedup_clusters_fixpoint,
)
from oracle_vector_search_spark.operators.propagation import kcore_peel

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"
C = 8  # component size (== WCC round count driver; n-independent)


def _components(spark, n):
    """(pairs, nodes): chain edges inside size-C components; even
    components close the ring. pairs = (left_id, right_id) undirected;
    nodes = one row per id."""
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % C).alias("pos"),
        ((F.col("id") / C).cast("long")).alias("comp"),
    )
    chain = base.filter(F.col("pos") < C - 1).select(
        F.col("id").alias("left_id"), (F.col("id") + 1).alias("right_id")
    )
    ring = base.filter(
        (F.col("pos") == C - 1) & (F.col("comp") % 2 == 0)
    ).select(
        F.col("id").alias("left_id"),
        (F.col("id") - (C - 1)).alias("right_id"),
    )
    nodes = base.select(F.col("id").alias("node"))
    return chain.unionByName(ring), nodes


@pytest.mark.parametrize("n", [100_000] + ([1_000_000] if STRESS else []))
def test_wcc_fixpoint_exact_components(spark, n):
    pairs, nodes = _components(spark, n)
    pairs = pairs.localCheckpoint()
    nodes = nodes.localCheckpoint()

    t0 = time.monotonic()
    comp = dedup_clusters_fixpoint(pairs, nodes, id_col="node")
    wrong = comp.filter(
        F.col("canonical_id")
        != (F.col("node") - F.col("node") % C)
    ).count()
    wall = time.monotonic() - t0

    assert wrong == 0
    n_comp = comp.select("canonical_id").distinct().count()
    assert n_comp == n // C

    # the fixpoint plan is flat: localCheckpoint per round means the
    # final explain doesn't accumulate one subtree per round
    plan = comp._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 4
    print(f"\nWCC-SCALE n={n}: fixpoint+verify={wall:.1f}s")


@pytest.mark.parametrize("n", [100_000] + ([1_000_000] if STRESS else []))
def test_kcore_peel_exact_rings(spark, n):
    pairs, nodes = _components(spark, n)
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("right_id").alias("left_id"),
                F.col("left_id").alias("right_id"),
            )
        )
        .select(
            F.col("left_id").alias("src"), F.col("right_id").alias("dst")
        )
        .localCheckpoint()
    )
    nodes = nodes.localCheckpoint()

    t0 = time.monotonic()
    core = kcore_peel(edges, nodes, k=2, rounds=C)
    # in_core iff even component (rings survive, chains dissolve)
    wrong = core.filter(
        F.col("in_core")
        != ((F.col("node") / C).cast("long") % 2 == 0)
    ).count()
    wall = time.monotonic() - t0

    assert wrong == 0
    survivors = core.filter("in_core").count()
    assert survivors == (n // C - n // (2 * C)) * C

    plan = core._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 4
    print(f"\nKCORE-SCALE n={n}: peel({C} rounds)+verify={wall:.1f}s")
