"""Scale evidence for the SFT-family kernels (operators/sft.py — the
same definitions the registered queries call): wall cost is
conversation-sized for the alternation lint and group-sized for the
GRPO advantage, and results are EXACT on a range-derived fixture with
known structure (rand()-free, partitioning-independent).

Transcript layout: every user owns exactly T = 16 events, 60 s apart
(< the 1800 s gap → exactly one conversation per user).  Roles follow
position: pos % 4 == 3 is assistant, else user — so each conversation
is four [user,user,user,assistant] blocks:

* first_role = 'user' for every conversation (output has ONE row),
* runs = 4 × (len-3 user run + len-1 assistant run) → violations
  = 4 × (3-1) = 8 per conversation, max_same_role_run = 3,
* strict_alternating = 0, avg_turns_micro = 16_000_000 exactly.

GRPO layout: task = id % 64, reward = (id * id) % 1000 cents.  Exact
invariants: every task has exactly n/64 samples; the UNROUNDED
advantages sum to 0 per group by construction ((Σr·n − n·Σr)/σ), so
the rounded per-task sum must sit within rounding distance of 0.

Always-on tier: 160k events / 1M samples.  ``OVS_SCALE_STRESS=1`` adds
1.6M events / 10M samples; the stress walls feed PERF.md.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.operators.sft import (
    group_advantage,
    turn_alternation_stats,
)

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"
T = 16  # turns per conversation


def _transcripts(spark, n):
    """n events: user = id div T, one conversation each, roles by
    position (pos % 4 == 3 → assistant)."""
    return spark.range(n).select(
        (F.col("id") / T).cast("long").alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds((F.col("id") % T) * 60).alias("ts"),
        F.when((F.col("id") % T) % 4 == 3, "assistant")
        .otherwise("user")
        .alias("role"),
    )


@pytest.mark.parametrize(
    "n", [160_000] + ([1_600_000] if STRESS else [])
)
def test_turn_alternation_exact_at_scale(spark, n):
    ev = _transcripts(spark, n).localCheckpoint()
    convs = n // T

    t0 = time.monotonic()
    rows = turn_alternation_stats(ev).collect()
    wall = time.monotonic() - t0

    assert len(rows) == 1
    r = rows[0].asDict()
    assert r == {
        "first_role": "user",
        "conversations": convs,
        "strict_alternating": 0,
        "adjacent_violations": 8 * convs,
        "max_same_role_run": 3,
        "avg_turns_micro": T * 1_000_000,
    }
    print(f"\nSFT-SCALE n={n}: alternation lint={wall:.1f}s")


@pytest.mark.parametrize(
    "n", [1_000_000] + ([10_000_000] if STRESS else [])
)
def test_group_advantage_exact_at_scale(spark, n):
    samples = spark.range(n).select(
        (F.col("id") % 64).alias("task_id"),
        F.col("id").alias("sample_id"),
        ((F.col("id") * F.col("id")) % 1000).alias("reward_cents"),
    ).localCheckpoint()

    t0 = time.monotonic()
    adv = group_advantage(
        samples, "task_id", "sample_id", "reward_cents"
    )
    per_task = (
        adv.groupBy("task_id")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("advantage").alias("adv_sum"),
        )
        .collect()
    )
    wall = time.monotonic() - t0

    assert len(per_task) == 64
    for row in per_task:
        assert row["n_samples"] == n // 64
        # unrounded advantages sum to exactly 0 per group; at 6-decimal
        # rounding the sum stays within n_samples * 5e-7
        assert abs(row["adv_sum"]) <= row["n_samples"] * 5e-7
    print(f"\nGRPO-SCALE n={n}: advantage+rollup={wall:.1f}s")
