"""Temporal operators Spark lacks natively: as-of join, range join,
batch sessionization.

These extend the engine beyond the reference (which has no timestamps —
SURVEY.md §1.2) into the time-series surface a training-data pipeline
needs. All three are compositions of built-in DataFrame ops — no UDFs,
no driver-side loops — chosen for their shuffle behavior at 100 TB:

* as-of join: the union-marker trick — one shuffle on (key), one
  window pass; avoids the per-key ``merge_asof`` pandas fallback.
* range join: bucketize the range key so the equi-join prunes the
  candidate space; the residual predicate filters within bucket pairs.
* sessionization: lag + conditional cumsum, the standard two-window
  formulation; one shuffle on (key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row for the same key:
    ``direction="backward"`` (default) takes the latest right row with
    ``right_ts <= left_ts``; ``direction="forward"`` takes the earliest
    right row with ``right_ts >= left_ts``.

    Implementation: tag both sides, union, sort within key by time via a
    window, and carry the last non-null right payload forward
    (``last(..., ignorenulls=True)``) — the forward direction reuses the
    same machinery over a DESCENDING time order, so both directions are
    one shuffle on ``key`` + one window pass; scales linearly in rows
    regardless of key skew in the time dimension. Left rows keep NULL
    payload when no matching right row exists (or when outside
    ``tolerance_seconds``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    fwd = direction == "forward"
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_payload],
    ).withColumn("__rts", F.col("__ts"))

    unioned = l.unionByName(r, allowMissingColumns=True)
    # Backward: ascending time, right rows sort before left rows at equal
    # timestamps (__side 0 < 1) so an exactly-simultaneous right row IS
    # visible to the left row; ties among right rows resolve by
    # right_tiebreak (last one wins). Forward: the mirror image —
    # descending time, so the running last() carries the EARLIEST
    # following right row; tiebreak descending so the smallest key wins
    # as the carried value.
    if fwd:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
        if right_tiebreak is not None:
            order.append(F.col(right_tiebreak).desc())
    else:
        order = [F.col("__ts").asc(), F.col("__side").asc()]
        if right_tiebreak is not None:
            order.append(F.col(right_tiebreak).asc())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__p_{c}")
            for c in right_payload
        ],
        F.last(F.col("__rts"), ignorenulls=True).over(w).alias("__matched_ts"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # Exact µs arithmetic (unix_timestamp would truncate to whole
        # seconds and admit matches up to 1s beyond the tolerance);
        # requires TIMESTAMP-typed ts columns.
        gap_us = (
            F.unix_micros(F.col("__matched_ts"))
            - F.unix_micros(F.col(left_ts))
            if fwd
            else F.unix_micros(F.col(left_ts))
            - F.unix_micros(F.col("__matched_ts"))
        )
        within = F.col("__matched_ts").isNotNull() & (
            gap_us <= tolerance_seconds * 1_000_000
        )
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(f"__p_{c}")).alias(c)
                for c in right_payload
            ],
        )
    else:
        out = out.select(
            *lcols, *[F.col(f"__p_{c}").alias(c) for c in right_payload]
        )
    return out


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
    direction: str = "backward",
    buckets: int = 32,
) -> DataFrame:
    """``asof_join`` for SKEWED keys: identical output, hot-key-safe
    plan (VERDICT r10 #7).

    The plain as-of is a window partitioned by ``key``, so a hot key
    (one user with 100× the rows) funnels its entire timeline through
    ONE task — and AQE's skew handling can't help, because
    ``skewedJoin`` only rebalances JOINs, not window partitions. The
    classic fix is time-domain salting, the window analogue of the
    two-level scan:

    1. bucket both sides into ``buckets`` equal time ranges (one tiny
       min/max job fixes the range);
    2. phase A: the union-marker window runs over ``(key, __bucket)``
       — the hot key's timeline splits across ``buckets`` tasks;
    3. phase B: per ``(key, __bucket)``, the boundary right row
       (latest for backward / earliest for forward) collapses to one
       row via ``max_by``/``min_by`` (map-side combinable); a window
       over the BUCKET AXIS (≤ ``buckets`` rows per key) carries it
       across bucket boundaries;
    4. the carry joins back on ``(key, __bucket)`` — the same hash
       partitioning phase A produced, so Catalyst reuses the exchange
       — and left rows whose bucket held no earlier right row take
       the carried payload.

    Cost vs plain: one extra (key, bucket)-cardinality aggregate and
    one co-partitioned join; the window state per task shrinks by
    ``buckets``×. Equivalence to ``asof_join`` is asserted on skewed
    fixtures by tests/test_temporal_ops.py."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    fwd = direction == "forward"
    lcols = left.columns

    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_payload],
    ).withColumn("__rts", F.col("__ts"))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # bucket on µs for TIMESTAMP columns, raw value for integral epoch
    # columns (the plain operator accepts both; only the tolerance
    # branch demands TIMESTAMP)
    from pyspark.sql.types import TimestampType

    is_ts = isinstance(
        unioned.schema["__ts"].dataType, TimestampType
    )
    ts_val = (
        F.unix_micros("__ts") if is_ts else F.col("__ts").cast("long")
    )

    # bounded: one min/max row pins the time range (metadata-sized at
    # any data scale); equal-width buckets
    rng = unioned.agg(
        F.min(ts_val).alias("lo"), F.max(ts_val).alias("hi")
    ).collect()[0]
    lo, hi = rng["lo"], rng["hi"]
    if lo is None:
        return asof_join(
            left, right, key, left_ts, right_ts, right_payload,
            tolerance_seconds, right_tiebreak, direction,
        )  # empty input: nothing to salt
    width = max((hi - lo) // buckets + 1, 1)
    unioned = unioned.withColumn(
        "__bucket", ((ts_val - F.lit(lo)) / F.lit(width)).cast("long")
    )

    # ---- phase A: within-bucket as-of (the salted window)
    if fwd:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
        if right_tiebreak is not None:
            order.append(F.col(right_tiebreak).desc())
    else:
        order = [F.col("__ts").asc(), F.col("__side").asc()]
        if right_tiebreak is not None:
            order.append(F.col(right_tiebreak).asc())
    wa = (
        Window.partitionBy(key, "__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        "__side",
        "__bucket",
        *[
            F.last(F.col(c), ignorenulls=True).over(wa).alias(f"__p_{c}")
            for c in right_payload
        ],
        F.last("__rts", ignorenulls=True).over(wa).alias("__matched_ts"),
    ).filter(F.col("__side") == 1)

    # ---- phase B: boundary right row per (key, bucket) + carry
    # across the bucket axis. groupBy includes left-only buckets (null
    # boundary), so the carry window covers every bucket that has data.
    pick = F.max_by if not fwd else F.min_by
    ordv = F.struct(
        F.col("__ts"),
        *([F.col(right_tiebreak)] if right_tiebreak is not None else []),
    )
    pay = F.struct(
        F.col("__rts").alias("__rts"),
        *[F.col(c).alias(c) for c in right_payload],
    )
    bounds = unioned.groupBy(key, "__bucket").agg(
        pick(
            F.when(F.col("__side") == 0, pay),
            F.when(F.col("__side") == 0, ordv),
        ).alias("__bound")
    )
    wb = Window.partitionBy(key).orderBy(
        F.col("__bucket").asc() if not fwd else F.col("__bucket").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    carry = bounds.select(
        key,
        "__bucket",
        F.last("__bound", ignorenulls=True).over(wb).alias("__carry"),
    )

    # ---- merge: same (key, bucket) hash partitioning on both sides
    out = carried.join(carry, [key, "__bucket"], "left")
    res = out.select(
        *lcols,
        F.coalesce(
            F.col("__matched_ts"), F.col("__carry.__rts")
        ).alias("__matched_ts"),
        *[
            F.coalesce(F.col(f"__p_{c}"), F.col(f"__carry.{c}")).alias(
                f"__f_{c}"
            )
            for c in right_payload
        ],
    )
    if tolerance_seconds is not None:
        gap_us = (
            F.unix_micros(F.col("__matched_ts"))
            - F.unix_micros(F.col(left_ts))
            if fwd
            else F.unix_micros(F.col(left_ts))
            - F.unix_micros(F.col("__matched_ts"))
        )
        within = F.col("__matched_ts").isNotNull() & (
            gap_us <= tolerance_seconds * 1_000_000
        )
        return res.select(
            *lcols,
            *[
                F.when(within, F.col(f"__f_{c}")).alias(c)
                for c in right_payload
            ],
        )
    return res.select(
        *lcols, *[F.col(f"__f_{c}").alias(c) for c in right_payload]
    )


def hot_asof_keys_from_profile(
    profile, key: str, hot_rows_threshold: int = 4_000_000
) -> list:
    """Extract the keys worth time-salting from a ``key_profile``
    table (operators/skew.py:key_profile — the at-rest skew telemetry
    refreshed on ingest).

    The as-of hazard is WINDOW-shaped, not join-shaped: the per-key
    window sorts n_left + n_right rows in one task, so hotness is the
    key's TOTAL timeline size, and the threshold is absolute — the
    measured plain/salted crossover (PERF.md 0h-asof: plain wins at
    4 M hot rows, salted 5.7× at 24 M), not the relative skew_mult
    rule equi-joins use (a uniformly huge key set is fine for a
    window; only a single long timeline binds).

    NULL keys are NEVER returned as hot — by policy the NULL timeline
    rides the plain tier (see ``asof_join_auto``). This is also a
    correctness requirement: a ``None`` inside an ``isin`` list makes
    the predicate NULL for every non-matching key (SQL three-valued
    IN), which would silently drop ALL cold rows from the dispatch
    split. Note too that ``key_profile``'s join-keyed aggregation
    cannot total a NULL timeline anyway: its full-outer join never
    matches NULL keys, so a NULL key's n_left and n_right land on two
    separate profile rows — a hot NULL timeline stays on the plain
    tier and is a documented dispatch limitation, not a silent row
    drop."""
    hot = profile.filter(
        F.col(key).isNotNull()
        & (
            (F.col("n_left") + F.col("n_right"))
            >= F.lit(int(hot_rows_threshold))
        )
    )
    # bounded: key_profile emits <= top_n rows by construction
    return [r[key] for r in hot.select(key).collect()]


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
    direction: str = "backward",
    buckets: int = 32,
    profile: DataFrame | None = None,
    hot_rows_threshold: int = 4_000_000,
) -> DataFrame:
    """Profile-dispatched as-of join (VERDICT r11 #6): the policy twin
    of ``profile_guided_salted_join``, for the window-shaped hazard.

    ``asof_join_salted`` is opt-in because it LOSES below the measured
    crossover (~4 M rows on the hot key's timeline — PERF.md 0h-asof).
    This wrapper makes the choice data-driven: consult the at-rest
    ``key_profile`` table (pass ``profile=`` to skip the scan — the
    100 TB path; computed inline otherwise), pull the keys whose total
    timeline exceeds ``hot_rows_threshold``, and

    * no hot keys → exactly ``asof_join`` (zero overhead beyond the
      profile read, ≤top_n rows from an at-rest table);
    * hot keys → split BOTH sides by a broadcast ``isin`` (as-of
      semantics are per-key independent, so a key-partition of the
      inputs unions to exactly the unsplit result): the cold slice
      runs the plain single-window tier, the hot slice runs the
      time-bucketed salted tier, and the union is the result the
      oracle hash-checks against the plain tier's SQL.

    At 100 TB the profile is metadata (≤top_n rows), the hot-key list
    is driver-side-bounded by top_n, and the salted tier's extra
    aggregate+join is paid only on the hot keys' rows."""
    from oracle_vector_search_spark.operators.skew import key_profile

    if profile is None:
        profile = key_profile(left, right, key)
    hot_keys = hot_asof_keys_from_profile(
        profile, key, hot_rows_threshold=hot_rows_threshold
    )
    common = dict(
        key=key,
        left_ts=left_ts,
        right_ts=right_ts,
        right_payload=right_payload,
        tolerance_seconds=tolerance_seconds,
        right_tiebreak=right_tiebreak,
        direction=direction,
    )
    if not hot_keys:
        return asof_join(left, right, **common)
    # NULL keys ride the cold slice on BOTH sides: the plain tier's
    # window partitionBy groups NULLs together (unlike an equi-join),
    # so NULL-key right rows must stay visible to NULL-key left rows
    hot = F.col(key).isin(hot_keys)
    cold_out = asof_join(
        left.filter(~hot | F.col(key).isNull()),
        right.filter(~hot | F.col(key).isNull()),
        **common,
    )
    hot_out = asof_join_salted(
        left.filter(hot),
        right.filter(hot),
        buckets=buckets,
        **common,
    )
    return cold_out.unionByName(hot_out)


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with the same key whose timestamps differ by
    at most ``max_gap_seconds`` (right strictly after left).

    A naive theta-join is O(n²) per key; here each side is bucketed into
    ``max_gap_seconds``-wide epochs and left joins right on
    (key, bucket) ∪ (key, bucket+1) — the candidate space shrinks to
    adjacent buckets and Catalyst executes plain equi-joins (shuffle or
    broadcast). The residual time predicate filters within candidates.
    """
    bucket_l = (F.unix_timestamp(F.col(left_ts)) / max_gap_seconds).cast("long")
    bucket_r = (F.unix_timestamp(F.col(right_ts)) / max_gap_seconds).cast("long")

    l = left.withColumn("__bucket", bucket_l)
    # each right row lands in its own bucket and the previous one, so any
    # pair within max_gap shares a bucket with the left row
    r = right.withColumn(
        "__bucket", F.explode(F.array(bucket_r, bucket_r - F.lit(1)))
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l.__bucket") == F.col("r.__bucket"))
    )
    pred = (
        (
            F.unix_timestamp(F.col(f"r.{right_ts}"))
            - F.unix_timestamp(F.col(f"l.{left_ts}"))
        ).between(1, max_gap_seconds)
    )
    return l.alias("l").join(r.alias("r"), cond).filter(pred)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_seconds``.

    lag → boundary flag → cumulative sum, two window passes over one
    shuffle on ``key``. Output adds ``session_id`` (1-based per key)."""
    order = [F.col(ts).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    gap = F.unix_timestamp(F.col(ts)) - F.unix_timestamp(
        F.lag(F.col(ts)).over(w)
    )
    new_session = (
        F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    )
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
