"""As-of join family: direction semantics on a hand-built frame, and
plan audits (one key-shuffle, never a cartesian/BNLJ candidate space).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from oracle_vector_search_spark.operators.temporal import (
    asof_join,
    range_join_within,
)


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),
            (2, "u", _ts("2024-01-01 12:00:00")),
            (3, "v", _ts("2024-01-01 10:30:00")),
        ],
        "lid INT, k STRING, lts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (10, "u", _ts("2024-01-01 09:00:00")),
            (11, "u", _ts("2024-01-01 11:00:00")),
            (12, "u", _ts("2024-01-01 13:00:00")),
            (13, "w", _ts("2024-01-01 10:00:00")),
        ],
        "rid INT, k STRING, rts TIMESTAMP",
    )
    return left, right


def test_asof_backward_latest_at_or_before(spark):
    left, right = _frames(spark)
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, "k", "lts", "rts", ["rid"], right_tiebreak="rid"
        ).collect()
    }
    # lid1@10:00 ← rid10@09:00; lid2@12:00 ← rid11@11:00; lid3 (key v) none
    assert got == {1: 10, 2: 11, 3: None}


def test_asof_forward_earliest_at_or_after(spark):
    left, right = _frames(spark)
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left,
            right,
            "k",
            "lts",
            "rts",
            ["rid"],
            right_tiebreak="rid",
            direction="forward",
        ).collect()
    }
    # lid1@10:00 → rid11@11:00; lid2@12:00 → rid12@13:00; lid3 none
    assert got == {1: 11, 2: 12, 3: None}


def test_asof_forward_tolerance_exact_micros(spark):
    left, right = _frames(spark)
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left,
            right,
            "k",
            "lts",
            "rts",
            ["rid"],
            tolerance_seconds=3600,
            right_tiebreak="rid",
            direction="forward",
        ).collect()
    }
    # 1h tolerance keeps both matches (gaps exactly 3600s — inclusive)
    assert got == {1: 11, 2: 12, 3: None}
    tight = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left,
            right,
            "k",
            "lts",
            "rts",
            ["rid"],
            tolerance_seconds=3599,
            right_tiebreak="rid",
            direction="forward",
        ).collect()
    }
    assert tight == {1: None, 2: None, 3: None}


def test_asof_plan_no_cartesian_single_key_shuffle(spark, sf_dir):
    """The union-marker as-of join must plan as window-over-one-shuffle:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    from oracle_vector_search_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("pid")
    )
    plan = asof_join(
        views, purchases, "user_id", "ts", "p_ts", ["pid"],
        direction="forward",
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_range_join_plan_is_equi_join(spark, sf_dir):
    """Bucketized range join must execute as an equi-join on
    (key, bucket) — the residual predicate stays a post-join filter,
    never a nested-loop candidate space."""
    from oracle_vector_search_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    plan = range_join_within(
        ev, ev, key="user_id", left_ts="ts", right_ts="ts",
        max_gap_seconds=60,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------- salted as-of: hot-key equivalence (VERDICT r10 #7)
def _skewed_frames(spark, n_hot=2_000, n_cold_keys=40, rows_per_cold=20):
    """One user with 100x the rows of every other — the window-skew
    shape AQE cannot rebalance (skewedJoin only covers joins)."""
    from pyspark.sql import functions as F

    hot = spark.range(0, n_hot, 1, 8).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("lid"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 7_000_000
        ).alias("lts"),
    )
    cold = spark.range(0, n_cold_keys * rows_per_cold, 1, 8).select(
        F.concat(F.lit("u"), (F.col("id") % n_cold_keys)).alias("k"),
        (F.col("id") + 1_000_000).alias("lid"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + (F.col("id") * 13_000_000) % (n_hot * 7_000_000)
        ).alias("lts"),
    )
    left = hot.unionByName(cold)
    right = spark.range(0, n_hot // 4, 1, 8).select(
        F.when(F.col("id") % 5 < 4, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.col("id") % 40))
        .alias("k"),
        F.col("id").alias("rid"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 23_000_000
        ).alias("rts"),
    )
    return left, right


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_asof_salted_equals_plain_on_skewed_keys(spark):
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_salted,
    )

    left, right = _skewed_frames(spark)
    for direction in ("backward", "forward"):
        plain = asof_join(
            left, right, "k", "lts", "rts", ["rid"],
            right_tiebreak="rid", direction=direction,
        )
        salted = asof_join_salted(
            left, right, "k", "lts", "rts", ["rid"],
            right_tiebreak="rid", direction=direction, buckets=16,
        )
        assert _rowset(salted) == _rowset(plain), direction


def test_asof_salted_equals_plain_with_tolerance(spark):
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_salted,
    )

    left, right = _skewed_frames(spark, n_hot=800)
    plain = asof_join(
        left, right, "k", "lts", "rts", ["rid"],
        tolerance_seconds=60, right_tiebreak="rid",
    )
    salted = asof_join_salted(
        left, right, "k", "lts", "rts", ["rid"],
        tolerance_seconds=60, right_tiebreak="rid", buckets=8,
    )
    assert _rowset(salted) == _rowset(plain)


def test_asof_salted_hand_semantics(spark):
    """The tiny hand-built frame from the plain tests must survive
    salting — including the bucket-boundary carry (bucket counts far
    above the row count force every row into its own bucket)."""
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_salted,
    )

    left, right = _frames(spark)
    got = {
        r["lid"]: r["rid"]
        for r in asof_join_salted(
            left, right, "k", "lts", "rts", ["rid"],
            right_tiebreak="rid", buckets=64,
        ).collect()
    }
    assert got == {1: 10, 2: 11, 3: None}
    fwd = {
        r["lid"]: r["rid"]
        for r in asof_join_salted(
            left, right, "k", "lts", "rts", ["rid"],
            right_tiebreak="rid", direction="forward", buckets=64,
        ).collect()
    }
    assert fwd == {1: 11, 2: 12, 3: None}


def test_asof_salted_window_partitions_by_key_and_bucket(spark):
    """Plan audit: the phase-A window must partition by (key, bucket)
    — the whole point — and the carry join must not re-shuffle the
    big side (exchange reuse on the same hash partitioning)."""
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_salted,
    )

    left, right = _skewed_frames(spark, n_hot=400)
    plan = asof_join_salted(
        left, right, "k", "lts", "rts", ["rid"], buckets=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan.split("Window")[1][:400], (
        "phase-A window does not partition on the salt bucket"
    )


# --------------------- auto dispatch: profile-driven tier choice (r12)
def test_asof_auto_dispatches_plain_when_no_hot_keys(spark):
    """Balanced profile (production 4M threshold, tiny fixture) →
    the output must BE the plain tier's plan: no salt bucket column,
    single union-marker window."""
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_auto,
    )

    left, right = _frames(spark)
    out = asof_join_auto(
        left, right, "k", "lts", "rts", ["rid"], right_tiebreak="rid"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the plain tier is ONE union-marker window; no salt bucket, no
    # carry window anywhere in the plan
    assert "__bucket" not in plan
    assert plan.count("Window") == 1
    plain = asof_join(
        left, right, "k", "lts", "rts", ["rid"], right_tiebreak="rid"
    )
    assert _rowset(out) == _rowset(plain)
    # VERDICT r13 #5: the empty-hot dispatch must BE the plain tier's
    # plan, fingerprint-for-fingerprint — not merely row-equal. The
    # dispatch premium (split + union + second window) is paid ONLY
    # when a hot key exists. Canonicalize expression/plan ids (#123)
    # before comparing: ids differ across analyses of identical plans.
    import re

    def fingerprint(df):
        s = df._jdf.queryExecution().optimizedPlan().toString()
        return re.sub(r"#\d+[L]?", "#x", s)

    assert fingerprint(out) == fingerprint(plain)


def test_asof_auto_salts_profiled_hot_keys_only(spark):
    """Threshold below the hot key's timeline → the plan must carry
    BOTH tiers (union of plain cold slice + bucketed hot slice) and
    the rows must equal the plain tier's exactly."""
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_auto,
    )

    left, right = _skewed_frames(spark, n_hot=800)
    out = asof_join_auto(
        left, right, "k", "lts", "rts", ["rid"],
        right_tiebreak="rid", buckets=8, hot_rows_threshold=500,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan, "hot slice did not route through salting"
    # both tiers present: the cold slice's single key window + the hot
    # slice's phase-A (key, bucket) window and bucket-axis carry window
    assert plan.count("Window") >= 3, "cold slice missing (all salted?)"
    plain = asof_join(
        left, right, "k", "lts", "rts", ["rid"], right_tiebreak="rid"
    )
    assert _rowset(out) == _rowset(plain)


def test_asof_auto_accepts_at_rest_profile(spark):
    """Passing profile= must skip the inline key_profile scan (the
    100 TB path) and drive the same dispatch; hot keys listed in the
    profile above threshold go salted."""
    from oracle_vector_search_spark.operators.skew import key_profile
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_auto,
        hot_asof_keys_from_profile,
    )

    left, right = _skewed_frames(spark, n_hot=800)
    prof = key_profile(left, right, "k")
    # the profile names 'hot' as the heaviest timeline
    assert hot_asof_keys_from_profile(prof, "k", 500) == ["hot"]
    out = asof_join_auto(
        left, right, "k", "lts", "rts", ["rid"],
        right_tiebreak="rid", buckets=8,
        profile=prof, hot_rows_threshold=500,
    )
    plain = asof_join(
        left, right, "k", "lts", "rts", ["rid"], right_tiebreak="rid"
    )
    assert _rowset(out) == _rowset(plain)


def test_asof_auto_null_keys_ride_cold_slice(spark):
    """NULL keys group together under the plain tier's window
    partitioning (unlike an equi-join) — the split must preserve
    that: NULL-key left rows still see NULL-key right rows."""
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_auto,
    )

    left = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-01 10:00:00")),
            (2, "hot", _ts("2024-01-01 10:00:00")),
            (3, "hot", _ts("2024-01-01 12:00:00")),
        ],
        "lid INT, k STRING, lts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (10, None, _ts("2024-01-01 09:00:00")),
            (11, "hot", _ts("2024-01-01 09:30:00")),
            (12, "hot", _ts("2024-01-01 11:00:00")),
        ],
        "rid INT, k STRING, rts TIMESTAMP",
    )
    out = asof_join_auto(
        left, right, "k", "lts", "rts", ["rid"],
        right_tiebreak="rid", buckets=4, hot_rows_threshold=2,
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    # NULL-key left row matches the NULL-key right row, exactly as the
    # plain tier would; hot rows salted
    assert got == {1: 10, 2: 11, 3: 12}
    plain = asof_join(
        left, right, "k", "lts", "rts", ["rid"], right_tiebreak="rid"
    )
    assert _rowset(out) == _rowset(plain)


def test_asof_auto_hot_null_timeline_never_poisons_the_split(spark):
    """r12 review regression: when the NULL-key timeline alone exceeds
    the threshold, a None in the hot-key list would make the isin
    predicate NULL for every non-matching key (three-valued IN) and
    the cold filter would silently DROP all cold non-NULL rows. NULL
    must never be returned as hot; the NULL timeline rides the plain
    tier and every cold key survives."""
    from oracle_vector_search_spark.operators.skew import key_profile
    from oracle_vector_search_spark.operators.temporal import (
        asof_join_auto,
        hot_asof_keys_from_profile,
    )

    left = spark.createDataFrame(
        [(i, None, _ts("2024-01-01 10:00:00")) for i in range(1, 6)]
        + [
            (6, "a", _ts("2024-01-01 10:00:00")),
            (7, "b", _ts("2024-01-01 12:00:00")),
        ],
        "lid INT, k STRING, lts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (10, None, _ts("2024-01-01 09:00:00")),
            (11, "a", _ts("2024-01-01 09:30:00")),
            (12, "b", _ts("2024-01-01 11:00:00")),
        ],
        "rid INT, k STRING, rts TIMESTAMP",
    )
    # the NULL key's left-side profile row (5 rows) is the only one at
    # or above the threshold — it must NOT appear in the hot list
    prof = key_profile(left, right, "k")
    hot = hot_asof_keys_from_profile(prof, "k", hot_rows_threshold=4)
    assert None not in hot
    out = asof_join_auto(
        left, right, "k", "lts", "rts", ["rid"],
        right_tiebreak="rid", buckets=4, hot_rows_threshold=4,
    )
    plain = asof_join(
        left, right, "k", "lts", "rts", ["rid"], right_tiebreak="rid"
    )
    # 7 left rows in, 7 rows out — the cold keys 'a'/'b' survive and
    # match exactly what the plain tier produces
    assert out.count() == left.count()
    assert _rowset(out) == _rowset(plain)
