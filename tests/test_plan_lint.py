"""Registry-wide scale-killer plan lint (VERDICT r8 #4) — the
executable form of the previously hand-adjudicated VERIFY.log window
warnings.  tools/plan_lint.py flags the four plan shapes that kill a
100 TB run; this file proves the lint CATCHES each shape (seeded bad
plans must flag) and that benign documented patterns pass, then lints
a representative registry slice inline.  The FULL registry walk runs
via ``python tools/plan_lint.py`` each round (committed in
VERIFY.log) or ``OVS_PLAN_LINT_FULL=1 pytest tests/test_plan_lint.py``.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tools.plan_lint import (
    CARTESIAN,
    GLOBAL_WINDOW,
    ROW_PYTHON,
    UNHINTED_TINY,
    lint_df,
    lint_registry,
)

FULL = os.environ.get("OVS_PLAN_LINT_FULL") == "1"


def _rules(findings):
    return {rule for _, rule, _ in findings}


# ---------------------------------------------- seeded BAD plans flag
def test_flags_global_window_over_fact_scan(spark, sf_dir):
    from pyspark.sql import Window

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    bad = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_extendedprice"))
    )
    assert GLOBAL_WINDOW in _rules(lint_df(bad, "seeded"))


def test_flags_cartesian_product(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    bad = li.crossJoin(od)
    assert CARTESIAN in _rules(lint_df(bad, "seeded"))


def test_flags_row_at_a_time_python_udf(spark, sf_dir):
    from pyspark.sql.types import IntegerType

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    slow = F.udf(lambda x: int(x) + 1, IntegerType())
    bad = li.select(slow("l_linenumber").alias("n"))
    assert ROW_PYTHON in _rules(lint_df(bad, "seeded"))


def test_flags_unhinted_tiny_join(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    top = (
        li.select("l_orderkey", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"))
        .limit(5)
        .withColumnRenamed("l_extendedprice", "top_price")
    )
    bad = li.join(top, "l_orderkey")  # tiny side, no broadcast hint
    assert UNHINTED_TINY in _rules(lint_df(bad, "seeded"))
    ok = li.join(F.broadcast(top), "l_orderkey")
    assert UNHINTED_TINY not in _rules(lint_df(ok, "benign"))


# ------------------------------------------- documented benign shapes
def test_flags_global_window_over_keyed_aggregate(spark, sf_dir):
    """r10 tightening (VERDICT r9 #1): a KEYED aggregate no longer
    bounds — a groupBy(token) histogram is 10^8+ rows at 100 TB, so an
    empty-spec window over it must flag. The blessed escapes are
    ``global_topn_ranked`` (TakeOrderedAndProject head slice) and
    ``bounded_global_order`` (anchored spec = in-code adjudication)."""
    from pyspark.sql import Window

    from oracle_vector_search_spark.operators.topk import (
        bounded_global_order,
        global_topn_ranked,
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))

    # keyed aggregate under an empty partition spec: FINDING
    bad = agg.withColumn("rk", F.row_number().over(Window.orderBy("q")))
    assert GLOBAL_WINDOW in _rules(lint_df(bad, "seeded"))

    # same frame through the head-slice helper: clean (top-k first,
    # then rank only the k rows under the constant non-empty anchor)
    ok_top = global_topn_ranked(agg, 5, F.desc("q"), F.asc("l_returnflag"))
    assert GLOBAL_WINDOW not in _rules(lint_df(ok_top, "benign"))

    # bounded-by-construction declaration: clean (anchored spec)
    w = bounded_global_order(
        agg, F.desc("q"), bound="one row per returnflag (3 values)"
    )
    ok_anchor = agg.withColumn("rk", F.row_number().over(w))
    assert GLOBAL_WINDOW not in _rules(lint_df(ok_anchor, "benign"))


def test_passes_global_window_over_groupless_aggregate(spark, sf_dir):
    """Grouping-free aggregates are exactly one row — still bounding."""
    from pyspark.sql import Window

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    agg = li.agg(F.sum("l_quantity").alias("q"))
    ok = agg.withColumn("rk", F.row_number().over(Window.orderBy("q")))
    assert GLOBAL_WINDOW not in _rules(lint_df(ok, "benign"))


def test_passes_broadcast_hinted_cross_join(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.limit(0).select("vec_id")  # shape only; hint is the point
    q = emb.select("vec_id").limit(5)
    ok = emb.join(F.broadcast(q.withColumnRenamed("vec_id", "qid")))
    assert CARTESIAN not in _rules(lint_df(ok, "benign"))


def test_passes_scalar_cross_join(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    total = li.agg(F.sum("l_quantity").alias("t"))
    ok = li.crossJoin(total)
    assert CARTESIAN not in _rules(lint_df(ok, "benign"))


# ------------------------------------------------- registry coverage
#: always-on slice: the plan families VERIFY.log used to adjudicate by
#: hand — global-window-looking queries, crossJoin tiers, SMJ plans
SLICE = [
    "knn_exact_cosine_top5",
    "maxsim_late_interaction_top5",
    "bucketed_colocated_join_revenue",
    "incremental_corpus_admission",
    "two_pass_exact_median",
    "vocab_coverage_curve",
    "bpe_merge_pairs_top20",
    "dedup_soft_sample_weights",
    "bradley_terry_mm_step",
    "qq_deciles_by_arm",
]


def test_registry_slice_is_clean(spark, sf_dir):
    findings, errors = lint_registry(spark, sf_dir, SLICE)
    assert not errors, errors
    assert not findings, findings


@pytest.mark.skipif(
    not FULL, reason="set OVS_PLAN_LINT_FULL=1 for the 337-plan walk "
    "(also run per-round as `python tools/plan_lint.py`)"
)
def test_full_registry_is_clean(spark, sf_dir):
    findings, errors = lint_registry(spark, sf_dir)
    assert not errors, errors
    assert not findings, findings


# ----------------------------------- bounded_global_order guard rails
def test_bounded_global_order_requires_stated_bound(spark, sf_dir):
    """ADVICE r10: the anchored spec is an in-code adjudication, so the
    caller must ARGUE the bound — an empty bound is a ValueError, and
    under OVS_ASSERT_BOUNDS=1 an understated max_rows raises."""
    import pytest as _pytest

    from oracle_vector_search_spark.operators.topk import (
        bounded_global_order,
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))

    with _pytest.raises(ValueError, match="bound="):
        bounded_global_order(agg, F.desc("q"))

    os.environ["OVS_ASSERT_BOUNDS"] = "1"
    try:
        with _pytest.raises(AssertionError, match="claimed <= 1"):
            bounded_global_order(
                agg, F.desc("q"), bound="understated", max_rows=1
            )
        # honest bound passes and returns a usable anchored spec
        w = bounded_global_order(
            agg, F.desc("q"), bound="3 returnflags", max_rows=10
        )
        ranked = agg.withColumn("rk", F.row_number().over(w))
        assert ranked.count() == agg.count()
    finally:
        del os.environ["OVS_ASSERT_BOUNDS"]
