"""Invariant property tests for the late-round-5 kernels.

The oracle gate proves Spark == DuckDB; these tests prove both engines
compute the RIGHT thing — algebraic invariants that hold by the
operator's definition, checked on the smoke fixture.
"""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod
import pytest


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def test_largest_remainder_allocations_sum_to_budget(spark, sf_dir, qs):
    rows = qs["largest_remainder_allocation"](spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == 10000
    for r in rows:
        # Hamilton: every source gets its floor quota or one extra unit
        assert r["alloc"] in (r["floor_alloc"], r["floor_alloc"] + 1)


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir, qs):
    rows = qs["scd2_user_type_intervals"](spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["version"])
        # versions contiguous from 1
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        for a, b in zip(ivs, ivs[1:]):
            # adjacent: each interval closes exactly where the next opens
            assert a["valid_to_us"] == b["valid_from_us"]
            # a change row always changes the value
            assert a["etype"] != b["etype"]
        # only the last interval is open
        assert ivs[-1]["valid_to_us"] == -1
        assert all(r["valid_to_us"] != -1 for r in ivs[:-1])


def test_scd2_point_in_time_never_leaks_future_versions(spark, sf_dir, qs):
    rows = qs["scd2_point_in_time_join"](spark, sf_dir).collect()
    assert rows, "expected events after the first order"
    for r in rows:
        assert r["valid_from_us"] <= r["ets_us"]


def test_c4_span_dedup_counts_are_consistent(spark, sf_dir, qs):
    rows = qs["c4_sentence_span_dedup"](spark, sf_dir).collect()
    total_dup = sum(r["dup_spans"] for r in rows)
    total_removed = sum(r["removed_spans"] for r in rows)
    for r in rows:
        assert 0 <= r["removed_spans"] <= r["dup_spans"] <= r["n_spans"]
        # a doc with < 3 sentences has no spans
        if r["n_sentences"] < 3:
            assert r["n_spans"] == 0
    # the C4 rule keeps exactly one occurrence per duplicated span, so
    # survivors (dup - removed) is the number of distinct duplicated
    # spans — strictly fewer than the duplicated occurrences
    if total_dup:
        assert 0 < total_dup - total_removed < total_dup


def test_golden_record_latest_values_exist_when_observed(
    spark, sf_dir, qs
):
    rows = qs["golden_record_survivorship"](spark, sf_dir).collect()
    for r in rows:
        assert r["n_value_obs"] <= r["n_events"]
        if r["n_value_obs"] > 0:
            assert r["latest_cents"] is not None
            assert r["latest_cents_ts_us"] is not None
        else:
            assert r["latest_cents"] is None


def test_bigram_lm_fluency_is_a_probability_sum(spark, sf_dir, qs):
    rows = qs["bigram_lm_fluency"](spark, sf_dir).collect()
    for r in rows:
        # each bigram term is (c2*1e6) div c1 <= 1e6 since c2 <= c1
        assert 0 < r["fluency_micro"] <= r["n_bigrams"] * 1_000_000
        assert 0 <= r["rare_bigrams"] <= r["n_bigrams"]


def test_ndcg_bounded_and_consistent_with_hits(spark, sf_dir, qs):
    rows = qs["retrieval_ndcg_audit"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r["ndcg_at_k"] <= 1.0
        assert r["hits_at_k"] <= min(r["n_relevant"], 20)
        # self-similar fixture: the label cohort should be findable
        if r["hits_at_k"] == min(r["n_relevant"], 20):
            assert r["ndcg_at_k"] == pytest.approx(1.0, abs=1e-6)


def test_table_stats_profile_internal_consistency(spark, sf_dir, qs):
    rows = qs["table_stats_profile"](spark, sf_dir).collect()
    assert len(rows) == 7
    n_rows = {r["n_rows"] for r in rows}
    assert len(n_rows) == 1  # every column profiled over the same scan
    for r in rows:
        assert 0 < r["n_distinct"] <= r["n_rows"]
        assert 0 <= r["n_nulls"] < r["n_rows"]
        has_num = r["min_num"] is not None
        has_str = r["min_str"] is not None
        assert has_num != has_str  # exactly one typed min/max pair
        if has_num:
            assert r["min_num"] <= r["max_num"]
        else:
            assert r["min_str"] <= r["max_str"]


def test_rolling_distinct_users_bounds(spark, sf_dir, qs):
    from oracle_vector_search_spark.io import load_table

    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    rows = qs["rolling_distinct_users_range"](spark, sf_dir).collect()
    assert all(1 <= r["distinct_users_1h"] <= n_users for r in rows)


def test_temperature_allocation_sums_and_flattens_the_head(
    spark, sf_dir, qs
):
    prop = {
        r["source"]: r["alloc"]
        for r in qs["largest_remainder_allocation"](spark, sf_dir).collect()
    }
    rows = qs["temperature_mixture_allocation"](spark, sf_dir).collect()
    temp = {r["source"]: r["alloc"] for r in rows}
    assert sum(temp.values()) == 10000
    for r in rows:
        assert r["alloc"] in (r["floor_alloc"], r["floor_alloc"] + 1)
    # sqrt smoothing moves quota from the largest source to the smallest
    toks = {r["source"]: r["toks"] for r in rows}
    biggest = max(toks, key=toks.get)
    smallest = min(toks, key=toks.get)
    assert temp[biggest] <= prop[biggest]
    assert temp[smallest] >= prop[smallest]


def test_simpson_index_bounds_and_degenerate_cases(spark, sf_dir, qs):
    rows = qs["user_event_diversity_simpson"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["simpson_micro"] < 1_000_000
        if r["n_types"] == 1:
            assert r["simpson_micro"] == 0
        # Simpson is capped by 1 - 1/n_types (even spread)
        assert r["simpson_micro"] <= 1_000_000 - (
            1_000_000 // r["n_types"]
        ) + 1
