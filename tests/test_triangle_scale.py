"""Scale evidence for the degree-ordered triangle kernel: exact counts
on a synthetic graph with an EXTREME hub, derived entirely from
``spark.range`` arithmetic (rand()-free, partitioning-independent).

The adversarial structure for triangle counting is a hub: a naive
wedge join enumerates C(deg(hub), 2) pairs at the hub — quadratic in
its degree — while the degree-ordered orientation enumerates each
wedge at the edge's LOWER-degree endpoint, so the hub (highest degree
by construction) is the head of every incident oriented edge and
contributes ZERO wedges itself. The probe graph makes both the counts
and the wedge population exact:

* hub 0 connects to every spoke 1..n-1  (star: no triangles alone);
* consecutive spokes (i, i+1) for even i close exactly
  floor((n-1)/2) disjoint triangles (0, i, i+1).

Every spoke has degree ≤ 3, so the oriented wedge list is O(n) — the
arboricity bound in action — and each expected triangle count is a
closed form of n.

Always-on tier: 100k spokes. A 1M tier runs under OVS_SCALE_STRESS=1
(the propagation/dedup probe switch); wall numbers feed PERF.md.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.operators.propagation import (
    triangle_counts,
)

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"


def _hub_graph(spark, n):
    """Edges (left < right): hub 0 to every spoke, plus (i, i+1) for
    even spoke i — the hub's degree is n-1 while every spoke's is ≤3."""
    spokes = spark.range(1, n).select(
        F.lit(0).cast("long").alias("left_id"),
        F.col("id").alias("right_id"),
    )
    rims = (
        spark.range(1, n - 1)
        .filter(F.col("id") % 2 == 0)
        .select(
            F.col("id").alias("left_id"),
            (F.col("id") + 1).alias("right_id"),
        )
    )
    return spokes.unionByName(rims)


def _check(spark, n):
    t0 = time.time()
    out = {
        r["node"]: (r["degree"], r["n_tri"])
        for r in triangle_counts(
            _hub_graph(spark, n), id_col="node"
        ).collect()
    }
    wall = time.time() - t0
    n_tri_total = (n - 2) // 2  # one triangle per even spoke pair
    # the hub is in EVERY triangle
    assert out[0] == (n - 1, n_tri_total)
    # rim endpoints: exact (degree, n_tri) per probed node (ADVICE
    # r14 — the old `tri in (0, 1)` spot check was vacuous). An even
    # spoke i has edges (0, i) and (i, i+1); its odd partner i+1 has
    # (0, i+1) and (i, i+1) — both degree 2, each in exactly ONE
    # triangle. Spoke 1 is never a rim endpoint (rims start at 2):
    # degree 1 (hub only), zero triangles.
    assert out[1] == (1, 0)
    for i in (2, 3, 5, (n - 2) - ((n - 2) % 2)):
        assert out[i] == (2, 1), f"spoke {i}: {out[i]}"
    # triangle attribution is 3x the total across all nodes
    assert sum(t for _, t in out.values()) == 3 * n_tri_total
    return wall


def test_triangle_hub_100k(spark):
    wall = _check(spark, 100_000)
    # loose ceiling: catches an accidental quadratic hub wedge join
    # (C(100k, 2) = 5e9 pairs would never finish in this budget)
    assert wall < 120, f"hub probe took {wall:.1f}s — wedge blow-up?"


@pytest.mark.skipif(not STRESS, reason="OVS_SCALE_STRESS=1 only")
def test_triangle_hub_1m_stress(spark):
    wall = _check(spark, 1_000_000)
    print(f"triangle hub 1M wall: {wall:.1f}s")
