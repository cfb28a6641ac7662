"""Scale evidence for the incremental index-rebuild design behind
``snapshot_index_rebuild_plan``: on a synthetic corpus the DELTA
assignment path must (a) agree row-for-row with a full reassignment
restricted to the delta — the correctness crux of carrying unchanged
rows' at-rest assignments forward — and (b) cost a small fraction of
the full corpus ranking, which is the whole point at 100 TB.

Vectors and seeds derive from ``spark.range`` arithmetic (rand()-free,
partitioning-independent): vec i has v[j] = ((i*7 + j*13) % 97) / 97,
seeds every 1000th id — the O(corpus/1000) frozen codebook the
snapshots share.

Always-on tier: 100k vectors × dim 8 × 100 seeds. A 500k tier runs
under OVS_SCALE_STRESS=1; wall numbers feed PERF.md.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.operators.ann import ivf_assign

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"

DIM = 8
MOD_STRIDE = 89  # vec_id % 89 == 2 -> modified (the query's delta)


def _synth_vecs(spark, n):
    comps = [
        ((F.col("id") * 7 + j * 13) % 97).cast("double") / F.lit(97.0)
        for j in range(DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("v")
    )


def _seeds(vs):
    return vs.filter(F.col("vec_id") % 1000 == 0).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv")
    )


def _perturb(df):
    return df.select(
        "vec_id",
        F.concat(
            F.array(F.element_at("v", 1) + F.lit(0.25)),
            F.slice("v", 2, DIM - 1),
        ).alias("v"),
    )


def _check(spark, n):
    vs = _synth_vecs(spark, n)
    seeds = _seeds(vs).localCheckpoint()  # frozen codebook, tiny

    t0 = time.time()
    full_old = ivf_assign(
        vs, id_col="vec_id", vec_col="v", seeds=seeds
    ).localCheckpoint()  # the nightly build: corpus x seeds ranking
    n_old = full_old.count()
    full_wall = time.time() - t0
    assert n_old == n

    mods = _perturb(vs.filter(F.col("vec_id") % MOD_STRIDE == 2))

    t0 = time.time()
    delta = ivf_assign(
        mods, id_col="vec_id", vec_col="v", seeds=seeds
    )
    delta_rows = {r["vec_id"]: r["cluster_id"] for r in delta.collect()}
    delta_wall = time.time() - t0
    assert len(delta_rows) == n // MOD_STRIDE + (1 if n % MOD_STRIDE > 2 else 0)

    # correctness crux: the delta assignment must equal a FULL
    # reassignment of the new snapshot, restricted to the delta
    new_snap = (
        vs.filter(F.col("vec_id") % MOD_STRIDE != 2).unionByName(mods)
    )
    full_new = ivf_assign(
        new_snap, id_col="vec_id", vec_col="v", seeds=seeds
    )
    full_on_delta = {
        r["vec_id"]: r["cluster_id"]
        for r in full_new.filter(
            F.col("vec_id") % MOD_STRIDE == 2
        ).collect()
    }
    assert delta_rows == full_on_delta
    # unchanged rows keep their standing assignment (carry-forward is
    # sound): spot-check a slice
    old_slice = {
        r["vec_id"]: r["cluster_id"]
        for r in full_old.filter(F.col("vec_id") < 500).collect()
        if r["vec_id"] % MOD_STRIDE != 2
    }
    new_slice = {
        r["vec_id"]: r["cluster_id"]
        for r in full_new.filter(F.col("vec_id") < 500).collect()
        if r["vec_id"] % MOD_STRIDE != 2
    }
    assert old_slice == new_slice
    return full_wall, delta_wall


def test_delta_assignment_exact_at_100k(spark):
    full_wall, delta_wall = _check(spark, 100_000)
    # the delta path scores n/89 vectors instead of n — it must come
    # in far under the full ranking even with scheduling overhead
    # (generous 2x margin; the arithmetic ratio is ~89x)
    assert delta_wall < max(2.0, full_wall / 2), (
        f"delta assignment {delta_wall:.1f}s vs full {full_wall:.1f}s"
    )


@pytest.mark.skipif(not STRESS, reason="OVS_SCALE_STRESS=1 only")
def test_delta_assignment_exact_at_500k_stress(spark):
    full_wall, delta_wall = _check(spark, 500_000)
    print(
        f"rebuild delta 500k: full {full_wall:.1f}s, "
        f"delta {delta_wall:.1f}s"
    )
