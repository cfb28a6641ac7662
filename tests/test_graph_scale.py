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


# ---------------------------------------------- DBSCAN / HITS (r7 add)
# VERDICT r6 #5 named four fixture-sized iterative families; WCC and
# k-core got probes above — these close the set with the same
# discipline: range-derived graphs with EXACT expected answers.

D = 10  # nodes per DBSCAN component: 8-clique + 1 pendant + 1 isolated
_CLIQUE_PAIRS = [(i, j) for i in range(8) for j in range(i + 1, 8)]


def _dbscan_graph(spark, n):
    """Per component c of D ids: positions 0..7 form a clique (degree
    ≥ 7 → core), position 8 hangs off position 0 (degree 1 → border,
    adopting cluster c*D), position 9 is isolated (→ noise)."""
    comp = spark.range(n // D).select(F.col("id").alias("c"))
    tmpl = F.array(
        *[
            F.struct(F.lit(i).alias("pi"), F.lit(j).alias("pj"))
            for (i, j) in _CLIQUE_PAIRS
        ]
    )
    clique = comp.select(
        "c", F.explode(tmpl).alias("p")
    ).select(
        (F.col("c") * D + F.col("p.pi")).alias("left_id"),
        (F.col("c") * D + F.col("p.pj")).alias("right_id"),
    )
    pendant = comp.select(
        (F.col("c") * D).alias("left_id"),
        (F.col("c") * D + 8).alias("right_id"),
    )
    nodes = spark.range(n).select(F.col("id").alias("vec_id"))
    return clique.unionByName(pendant), nodes


@pytest.mark.parametrize("n", [100_000] + ([1_000_000] if STRESS else []))
def test_dbscan_exact_roles(spark, n):
    from oracle_vector_search_spark.operators.propagation import (
        dbscan_from_edges,
    )

    pairs, nodes = _dbscan_graph(spark, n)
    pairs = pairs.localCheckpoint()
    nodes = nodes.localCheckpoint()

    t0 = time.monotonic()
    out = dbscan_from_edges(pairs, nodes, min_pts=3, id_col="vec_id")
    expected_role = (
        F.when(F.col("vec_id") % D <= 7, "core")
        .when(F.col("vec_id") % D == 8, "border")
        .otherwise("noise")
    )
    expected_cid = F.when(
        F.col("vec_id") % D == 9, F.lit(-1)
    ).otherwise(F.col("vec_id") - F.col("vec_id") % D)
    wrong = out.filter(
        (F.col("role") != expected_role)
        | (F.col("cluster_id") != expected_cid)
    ).count()
    wall = time.monotonic() - t0

    assert wrong == 0
    # every leaf is a PINNED RDD scan (pairs / nodes / the fixpoint
    # checkpoint) — deg, core-edge build, and border each reference the
    # pinned pair list, so the leaf count is fixed by the kernel's
    # structure (9), independent of fixpoint round count
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 9
    print(f"\nDBSCAN-SCALE n={n}: membership+fixpoint+verify={wall:.1f}s")


@pytest.mark.parametrize("n", [100_000] + ([1_000_000] if STRESS else []))
def test_hits_exact_star_graph(spark, n):
    """Star components: node c*D points at its 9 satellites (w=1). By
    symmetry the L1-normalized fixpoint is closed-form — hubs split
    the hub mass equally, satellites split the authority mass — and
    HITS reaches it after ONE round, so the 2-round values are exact
    up to float summation (asserted at 1e-9)."""
    from oracle_vector_search_spark.operators.propagation import hits_l1

    n_comp = n // D
    comp = spark.range(n_comp).select(F.col("id").alias("c"))
    sat = F.array(*[F.lit(i) for i in range(1, D)])
    edges = comp.select(
        "c", F.explode(sat).alias("p")
    ).select(
        (F.col("c") * D).alias("src"),
        (F.col("c") * D + F.col("p")).alias("dst"),
        F.lit(1.0).alias("w"),
    ).localCheckpoint()
    nodes = spark.range(n).select(F.col("id").alias("node"))
    nodes = nodes.localCheckpoint()

    t0 = time.monotonic()
    out = hits_l1(edges, nodes, iters=2)
    hub_exp = F.when(
        F.col("node") % D == 0, F.lit(1.0 / n_comp)
    ).otherwise(F.lit(0.0))
    auth_exp = F.when(
        F.col("node") % D == 0, F.lit(0.0)
    ).otherwise(F.lit(1.0 / (n_comp * (D - 1))))
    wrong = out.filter(
        (F.abs(F.col("h") - hub_exp) > 1e-9)
        | (F.abs(F.col("a") - auth_exp) > 1e-9)
    ).count()
    wall = time.monotonic() - t0

    assert wrong == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 4
    print(f"\nHITS-SCALE n={n}: 2 rounds+verify={wall:.1f}s")
