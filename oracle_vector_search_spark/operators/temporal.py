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
