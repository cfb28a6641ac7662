"""Streaming state-scale stress (VERDICT r5 #6).

The streaming oracle queries assume BATCHING-INDEPENDENCE: the final
snapshot of a foreachBatch merge must not depend on how the source
happened to micro-batch. The fixture-sized tests exercise 2-4 epochs;
this stress drains a large multi-batch corpus TWICE with different
``maxFilesPerTrigger`` (different epoch counts, different batch
boundaries) and asserts the two final snapshots are row-identical and
equal the batch latest-wins rebuild — the exact property the DuckDB
oracles rely on.

Tiers: an always-on 50k-event tier (seconds), and a 1M-event tier when
``OVS_SCALE_STRESS=1`` whose per-epoch walls + state-row counts are
printed for PERF.md.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import DataFrame, Window, functions as F

from oracle_vector_search_spark.operators.merge import merge_upsert
from oracle_vector_search_spark.scratch import scratch_dir

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"

_SCHEMA = "user_id long, ts_us long, event_id long, value_cents long"


def _make_source(spark, n_events: int, n_users: int, n_files: int) -> str:
    """Deterministic CDC feed: heavy per-user collisions AND exact
    (user, ts) ties, so latest-wins tie-breaking is genuinely
    exercised across batch boundaries."""
    src = scratch_dir("ovs_stream_stress_src_")
    (
        spark.range(n_events)
        .select(
            (F.col("id") % n_users).alias("user_id"),
            # ~10 distinct ts per user -> many exact ties
            ((F.col("id") * 7919) % (n_users * 10)).alias("ts_us"),
            F.col("id").alias("event_id"),
            (F.col("id") % 1000).alias("value_cents"),
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src)
    )
    return src


def _drain(spark, src: str, files_per_trigger: int):
    """foreachBatch latest-wins merge into a versioned snapshot; returns
    (final_path, n_epochs, per_epoch_seconds)."""
    snap_root = scratch_dir("ovs_stream_stress_snap_")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(src)
    )
    state = {"path": None, "version": 0, "walls": []}

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        sess = batch_df.sparkSession
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if state["path"] is not None:
            base = sess.read.schema(_SCHEMA).parquet(state["path"])
            latest = merge_upsert(
                base,
                latest,
                keys=["user_id"],
                order_cols=["ts_us", "event_id"],
            )
        out = f"{snap_root}/v{state['version']}"
        latest.write.mode("overwrite").parquet(out)
        state["path"] = out
        state["version"] += 1
        state["walls"].append(time.time() - t0)

    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    q = stream.writeStream.foreachBatch(merge_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    assert state["path"] is not None
    return state["path"], state["version"], state["walls"]


def _snapshot_checksum(spark, path: str):
    df = spark.read.schema(_SCHEMA).parquet(path)
    row = df.agg(
        F.count("*").alias("n"),
        F.expr(
            "bit_xor(xxhash64(user_id, ts_us, event_id, value_cents))"
        ).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


@pytest.mark.parametrize(
    "n_events,n_users,n_files",
    [(50_000, 5_000, 6)]
    + ([(1_000_000, 100_000, 8)] if STRESS else []),
)
def test_merge_snapshot_is_batching_independent(
    spark, n_events, n_users, n_files
):
    src = _make_source(spark, n_events, n_users, n_files)

    path_a, epochs_a, walls_a = _drain(spark, src, files_per_trigger=1)
    path_b, epochs_b, walls_b = _drain(
        spark, src, files_per_trigger=max(2, n_files // 2)
    )
    assert epochs_a == n_files  # one epoch per file
    assert epochs_b < epochs_a  # genuinely different batching

    ck_a = _snapshot_checksum(spark, path_a)
    ck_b = _snapshot_checksum(spark, path_b)
    assert ck_a == ck_b, (
        f"final snapshot depends on batching: {ck_a} != {ck_b}"
    )

    # equals the batch latest-wins rebuild over the full corpus
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    rebuild = (
        spark.read.schema(_SCHEMA)
        .parquet(src)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    row = rebuild.agg(
        F.count("*").alias("n"),
        F.expr(
            "bit_xor(xxhash64(user_id, ts_us, event_id, value_cents))"
        ).alias("h"),
    ).collect()[0]
    assert (row["n"], row["h"]) == ck_a
    assert row["n"] == n_users  # every user retained exactly once

    if STRESS:
        print(
            f"\nSTREAM-STRESS n_events={n_events} state_rows={n_users} "
            f"epochs={epochs_a} per-epoch walls (fpt=1): "
            f"{[round(x, 2) for x in walls_a]} | "
            f"epochs={epochs_b} (fpt={max(2, n_files // 2)}): "
            f"{[round(x, 2) for x in walls_b]}"
        )
