"""Plan-quality regression tests: the scale properties of the flagship
queries asserted against the actual Catalyst physical plans."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from oracle_vector_search_spark.plans.inspect import (
    assert_plan_contains,
    assert_plan_lacks,
)


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def test_q1_pushdown_and_partial_agg(spark, sf_dir, qs):
    df = qs["q1_pricing_summary"](spark, sf_dir)
    assert_plan_contains(
        df,
        "PushedFilters",
        "LessThanOrEqual(l_shipdate",
        "HashAggregate",
    )


def test_global_topk_is_take_ordered(spark, sf_dir, qs):
    df = qs["top_orders_global"](spark, sf_dir)
    assert_plan_contains(df, "TakeOrderedAndProject")
    assert_plan_lacks(df, "SortMergeJoin")


def test_group_topk_has_window_group_limit(spark, sf_dir, qs):
    df = qs["top3_orders_per_customer"](spark, sf_dir)
    assert_plan_contains(df, "WindowGroupLimit")


def test_star_join_broadcasts_dims(spark, sf_dir, qs):
    df = qs["revenue_by_nation"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_knn_broadcasts_queries_not_index(spark, sf_dir, qs):
    df = qs["knn_exact_cosine_top5"](spark, sf_dir)
    # the (small) query side broadcasts; the index must never shuffle
    assert_plan_contains(df, "BroadcastNestedLoopJoin", "WindowGroupLimit")
    assert_plan_lacks(df, "SortMergeJoin")


def test_scan_prunes_columns(spark, sf_dir, qs):
    df = qs["top_orders_global"](spark, sf_dir)
    from oracle_vector_search_spark.plans.inspect import formatted_plan

    plan = formatted_plan(df)
    # 4 selected columns; o_orderdate must NOT be read
    assert "o_orderdate" not in plan.split("ReadSchema")[1].split("\n")[0]
