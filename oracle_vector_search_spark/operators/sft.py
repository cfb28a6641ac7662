"""SFT-data kernels shared by the registered queries and the scale
probes (tests/test_sft_scale.py) — one definition, two call sites, the
same discipline as the retrieval probe's ``build_posting_tables``.

Reference scope note: the reference (Niobe96/Oracle_vector_search)
has no training-data surface; these kernels back the LLM-pipeline
families the brief adds alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from oracle_vector_search_spark.operators.temporal import sessionize


def turn_alternation_stats(
    ev: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Chat-transcript alternation lint over events carrying
    ``(user_id, event_id, ts, role)``: sessionize into conversations,
    then roll same-role runs up to per-opening-role structure stats.

    Single-shuffle shape: sessionize partitions by user_id; the turn
    and run windows cluster on (user_id, session_id) and both rollups
    group on supersets of that, so every downstream stage is satisfied
    by the existing hash partitioning — no joins.  Violations fall out
    of run lengths (a run of L same-role turns = L-1 adjacent
    violations) and run_id == 1 is the conversation's opening run.

    Output: one row per distinct opening role with ``conversations``,
    ``strict_alternating``, ``adjacent_violations``,
    ``max_same_role_run`` and ``avg_turns_micro`` (exact integer
    micro-units)."""
    sess = sessionize(
        ev, "user_id", "ts", gap_seconds, order_tiebreak="event_id"
    )
    w = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    turns = sess.select(
        "user_id",
        "session_id",
        "role",
        F.row_number().over(w).alias("turn_idx"),
        F.when(F.col("role") == F.lag("role").over(w), 1)
        .otherwise(0)
        .alias("same_adj"),
    )
    # Run ids: turn_idx minus the cumulative count of same-role
    # adjacencies is constant within a run and increments across runs.
    wo = Window.partitionBy("user_id", "session_id").orderBy("turn_idx")
    runs = turns.withColumn(
        "run_id",
        F.col("turn_idx")
        - F.sum("same_adj").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    conv = (
        runs.groupBy("user_id", "session_id", "run_id", "role")
        .agg(F.count("*").alias("run_len"))
        .groupBy("user_id", "session_id")
        .agg(
            F.sum("run_len").alias("n_turns"),
            F.min(
                F.when(F.col("run_id") == 1, F.col("role"))
            ).alias("first_role"),
            F.sum(F.col("run_len") - 1).alias("violations"),
            F.max("run_len").alias("max_run"),
        )
    )
    return (
        conv.groupBy("first_role")
        .agg(
            F.count("*").alias("conversations"),
            F.sum(
                F.when(F.col("violations") == 0, 1).otherwise(0)
            ).alias("strict_alternating"),
            F.sum("violations").alias("adjacent_violations"),
            F.max("max_run").alias("max_same_role_run"),
            (F.lit(1000000) * F.sum("n_turns"))
            .cast("bigint")
            .alias("_sum"),
        )
        .select(
            "first_role",
            "conversations",
            "strict_alternating",
            "adjacent_violations",
            "max_same_role_run",
            F.expr("_sum div conversations").alias("avg_turns_micro"),
        )
        .orderBy("first_role")
    )


def group_advantage(
    df: DataFrame,
    group_col: str,
    id_col: str,
    reward_col: str,
    round_scale: int = 6,
) -> DataFrame:
    """GRPO group-relative advantage over exact integer rewards:
    adv = (r·n − Σr) / √(n·Σr² − (Σr)²), i.e. (r − μ)/σ with the
    population σ, restated so numerator and radicand are exact BIGINTs;
    IEEE sqrt/divide are correctly rounded, so the doubles are
    bit-identical cross-engine.  σ = 0 groups get advantage 0.

    One shuffle on ``group_col``; the three group moments are unbounded
    windows riding that partitioning.  ``reward_col`` must be an exact
    integer column (cents-scaled upstream); moments stay in BIGINT up
    to ~10⁹ rows/group, beyond which the same expressions lift to
    DECIMAL(38,0) unchanged."""
    from oracle_vector_search_spark.functions.rounding import round_signed

    w = Window.partitionBy(group_col)
    r: Column = F.col(reward_col)
    stats = df.select(
        group_col,
        id_col,
        reward_col,
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum(r).over(w).cast("bigint").alias("s1"),
        F.sum(r * r).over(w).cast("bigint").alias("s2"),
    )
    radicand = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    adv = F.when(radicand == 0, F.lit(0.0)).otherwise(
        (F.col(reward_col) * F.col("n") - F.col("s1")).cast("double")
        / F.sqrt(radicand.cast("double"))
    )
    return stats.select(
        group_col,
        id_col,
        reward_col,
        "n",
        round_signed(adv, round_scale).alias("advantage"),
    ).orderBy(group_col, id_col)
