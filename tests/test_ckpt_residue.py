"""localCheckpoint residue stays bounded across repeated invocations.

VERDICT r12 "What's wrong" #2: every ``localCheckpoint()`` pins blocks
that are only reclaimed when GC happens to trigger ContextCleaner, so a
long-lived session re-invoking a checkpointing query accumulated one
persistent RDD per run (measured: 6 psi runs → 6 pinned RDDs). The fix
(plans/ckpt.py) releases the superseded invocation's blocks
deterministically: ``keyed_local_checkpoint`` on re-derivation,
``RoundScope.release_superseded``/``transfer_to_key`` in fixpoint
loops. These tests are the "done" criterion: N runs in one session must
NOT grow the persistent-RDD count by N.
"""

from __future__ import annotations

import pytest

from oracle_vector_search_spark.queries import queries as registry_queries


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _settled_count(spark) -> int:
    """Persistent-RDD count after forcing BOTH collectors: python GC
    (drops the DataFrame wrappers) then JVM GC (lets ContextCleaner
    reap the now-weakly-referenced unowned pins). Without settling,
    the raw count jitters by a few with cleaner timing — an entry
    counted at base can be GC-reclaimed and legitimately re-added by
    a re-run — and the comparison measures the GC, not the code."""
    import gc
    import time

    for _ in range(2):
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(0.7)
    return _n_persistent(spark)


def _settled_growth(spark, base: int, budget: int, attempts: int = 10):
    """Growth over ``base`` once the ContextCleaner CONVERGES. A fixed
    two-sweep settle flakes under host load (the cleaner's reap queue
    drains asynchronously; both r14 verify batteries each lost one
    residue case to it, different query each time) — so poll: a REAL
    leak holds strong references and never reclaims, so waiting longer
    can only help the no-leak case, never mask a leak."""
    import time

    grown = _settled_count(spark) - base
    for _ in range(attempts):
        if grown <= budget:
            break
        time.sleep(1.0)
        grown = _settled_count(spark) - base
    return grown


@pytest.mark.parametrize(
    "name, per_run_budget",
    [
        # one keyed checkpoint per invocation → steady-state adds 0
        ("psi_value_drift", 0),
        # loop: every round transfers to the query key; steady-state
        # re-runs replace (not stack) the prior invocation's set
        ("kcenter_coreset_seeds", 0),
        ("wordpiece_greedy_tokenize_top30", 0),
        # fixpoint operator under the query (dedup_clusters_fixpoint
        # keeps ONLY its final round, released by the next invocation)
        ("embedding_components_single_linkage", 0),
    ],
)
def test_repeated_invocation_residue_is_bounded(
    spark, sf_dir, name, per_run_budget
):
    q = registry_queries()[name]
    q(spark, sf_dir).count()  # first run: establishes the steady state
    base = _settled_count(spark)
    for _ in range(4):
        q(spark, sf_dir).count()
    grown = _settled_growth(spark, base, 4 * per_run_budget)
    assert grown <= 4 * per_run_budget, (
        f"{name}: persistent RDDs grew by {grown} over 4 re-runs "
        f"(budget {4 * per_run_budget}) — superseded localCheckpoint "
        "blocks are not being released"
    )


def test_mixed_session_residue_is_bounded(spark, sf_dir):
    """The VERDICT's mixed-session scenario: alternating checkpointing
    queries must hold the TOTAL pinned count flat once each query's
    steady state exists (each key owns exactly one live set)."""
    qs = registry_queries()
    names = [
        "psi_value_drift",
        "unigram_viterbi_tokenize_top30",
        "bpe_apply_ranked_merges_top30",
        "wordpiece_merge_gain_top20",
        # r13 sweep: single-pin queries, a prefix-doubling loop, and a
        # walk loop — all now keyed/scoped
        "doc_ngram_novelty",
        "top_revenue_suppliers",
        "suffix_array_repeated_substrings",
        "graph_ann_greedy_walk_recall",
    ]
    for n in names:  # establish every steady state
        qs[n](spark, sf_dir).count()
    base = _settled_count(spark)
    for _ in range(2):
        for n in names:
            qs[n](spark, sf_dir).count()
    grown = _settled_growth(spark, base, 1)
    # settled-to-settled, the steady state must not grow: every keyed
    # site owns exactly one live set and loops release their rounds.
    # (The pre-r13 failure mode was one NEW pin per run — +16 here.)
    assert grown <= 1, (
        f"mixed 16-run session grew settled persistent RDDs by "
        f"{grown} — superseded checkpoints are stacking again"
    )


def test_keyed_checkpoint_releases_previous_blocks(spark):
    """Unit check of the mechanism itself: the second keyed checkpoint
    under one key unpersists the first's blocks, and the new frame
    stays readable."""
    from oracle_vector_search_spark.plans.ckpt import (
        keyed_local_checkpoint,
    )

    base = _n_persistent(spark)
    df1 = keyed_local_checkpoint(spark.range(100), key="ckpt-test")
    assert df1.count() == 100
    assert _n_persistent(spark) == base + 1
    df2 = keyed_local_checkpoint(spark.range(200), key="ckpt-test")
    assert _n_persistent(spark) == base + 1  # df1's blocks released
    assert df2.count() == 200


def test_keyed_checkpoint_never_releases_bystander_caches(spark):
    """Regression (r13 adversarial review of the first ckpt.py cut):
    ownership must be the checkpointed RDD's OWN id, not a
    getPersistentRDDs diff — a ``persist()``-ed subtree whose cache
    materializes inside the checkpoint's job (the dedup fixpoint's
    edge cache during round 1 is the live example) was co-captured by
    the diff and wrongly unpersisted on the next release."""
    from oracle_vector_search_spark.plans.ckpt import (
        keyed_local_checkpoint,
    )

    sc = spark.sparkContext
    cached = spark.range(1000).selectExpr("id", "id % 7 AS k").persist()
    try:
        # the cache materializes INSIDE the first checkpoint's job
        keyed_local_checkpoint(
            cached.groupBy("k").count(), key="bystander-test"
        )
        ids_with_cache = {
            int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        }
        # the second checkpoint releases the first's ownership — the
        # bystander cache must SURVIVE that release
        keyed_local_checkpoint(
            cached.groupBy("k").count(), key="bystander-test"
        )
        ids_after = {
            int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        }
        dropped = ids_with_cache - ids_after
        # exactly one id may drop: the first checkpoint itself
        assert len(dropped) <= 1, (
            f"release dropped bystander ids {dropped}"
        )
        assert cached.count() == 1000  # cache still usable
    finally:
        cached.unpersist()


def test_round_scope_keeps_only_the_newest(spark):
    from oracle_vector_search_spark.plans.ckpt import RoundScope

    scope = RoundScope(spark)
    base = _n_persistent(spark)
    last = None
    for i in range(4):
        last = scope.checkpoint(spark.range(10 + i))
        scope.release_superseded()
    assert _n_persistent(spark) == base + 1
    assert last.count() == 13
    scope.transfer_to_key("round-scope-test")
    # the transferred final is released by the NEXT key owner
    scope2 = RoundScope(spark)
    cp = scope2.checkpoint(spark.range(5))
    scope2.transfer_to_key("round-scope-test")
    assert _n_persistent(spark) == base + 1
    assert cp.count() == 5
