"""Semantic invariants for the round-8 preference family — properties
that must hold for ANY corpus, checked on the smoke fixture (the
oracle gate pins exact values; these pin the MATH)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.queries import REGISTRY, load_all_modules

load_all_modules()


def _df(spark, sf_dir, name):
    return REGISTRY[name][0](spark, sf_dir)


def test_dpo_pairs_respect_margin_and_ranks(spark, sf_dir):
    rows = _df(spark, sf_dir, "preference_pairs_dpo").collect()
    for r in rows:
        assert r["margin"] >= 50_000
        assert r["margin"] == r["chosen_q"] - r["rejected_q"]
        assert r["chosen_doc"] != r["rejected_doc"]


def test_bradley_terry_invariants(spark, sf_dir):
    rows = _df(spark, sf_dir, "bradley_terry_mm_step").collect()
    assert rows, "sources must produce matches on the fixture"
    for r in rows:
        assert 0 <= r["wins"] <= r["n_matches"]
        assert r["pi_step1"] >= 0 and r["pi_step2"] >= 0
        # pi_step1 is exactly the scaled win rate under uniform init
        assert r["pi_step1"] == pytest.approx(
            2 * r["wins"] / r["n_matches"], abs=1e-6
        )
    # strengths order with win RATE under step 1
    by_rate = sorted(rows, key=lambda r: r["wins"] / r["n_matches"])
    pis = [r["pi_step1"] for r in by_rate]
    assert pis == sorted(pis)


def test_kappa_bounds_and_contingency(spark, sf_dir):
    r = _df(spark, sf_dir, "preference_agreement_kappa").collect()[0]
    assert r["n"] == r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert -1.0 <= r["kappa"] <= 1.0
    assert 0.0 <= r["p_observed"] <= 1.0
    assert 0.0 <= r["p_expected"] <= 1.0


def test_calibration_ece_is_weighted_gap_mean(spark, sf_dir):
    rows = _df(spark, sf_dir, "reward_calibration_ece").collect()
    n = sum(r["n_pairs"] for r in rows)
    ece = sum(r["n_pairs"] / n * r["gap"] for r in rows)
    for r in rows:
        assert 0.0 <= r["mean_confidence"] <= 1.0
        assert 0.0 <= r["win_rate"] <= 1.0
        assert r["ece"] == pytest.approx(ece, abs=2e-6)
        assert 0 <= r["bin"] <= 9


def test_best_of_n_lift_nonnegative(spark, sf_dir):
    for r in _df(spark, sf_dir, "best_of_n_selection_lift").collect():
        # max of a group is >= its mean, always
        assert r["bon_lift"] >= 0
        assert r["mean_best_q"] >= r["mean_q"]


def test_streaming_bt_matches_batch_wins(spark, sf_dir):
    stream = {
        r["source"]: (r["wins"], r["n_matches"])
        for r in _df(
            spark, sf_dir, "streaming_preference_bt_stats"
        ).collect()
    }
    batch = {
        r["source"]: (r["wins"], r["n_matches"])
        for r in _df(spark, sf_dir, "bradley_terry_mm_step").collect()
    }
    assert stream == batch


def test_mixture_weights_sum_to_one(spark, sf_dir):
    rows = _df(spark, sf_dir, "domain_mixture_mw_step").collect()
    s1 = sum(r["w_step1"] for r in rows)
    su = sum(r["w_uniform"] for r in rows)
    assert s1 == pytest.approx(1.0, abs=len(rows) * 1e-6)
    assert su == pytest.approx(1.0, abs=len(rows) * 1e-6)
    # higher loss must never get a smaller updated weight
    by_loss = sorted(rows, key=lambda r: r["loss"])
    ws = [r["w_step1"] for r in by_loss]
    assert ws == sorted(ws)


def test_truncation_monotone_in_budget(spark, sf_dir):
    rows = _df(spark, sf_dir, "truncation_loss_audit").orderBy(
        "ctx_len"
    ).collect()
    for a, b in zip(rows, rows[1:]):
        assert a["tokens_lost"] >= b["tokens_lost"]
        assert a["n_truncated"] >= b["n_truncated"]
        assert a["total_tokens"] == b["total_tokens"]
