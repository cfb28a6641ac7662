"""Checkpoint-recovery for the CDC upsert stream (VERDICT r10 #6).

Kill the foreachBatch upsert stream mid-run with an injected crash,
restart it from the SAME checkpoint, and assert:

* the restart does NOT re-deliver committed epochs (the ledger gains
  only the missing ones),
* the drained final snapshot equals the batch latest-wins oracle —
  i.e. the crash/restart left no duplicate, lost or stale rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Window, functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.streaming.ops import (
    upsert_snapshot_stream_recoverable,
)


def _batch_oracle(spark, sf_dir):
    """Latest-wins over ALL events — what the snapshot must converge
    to no matter how the stream batched or where it died."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def test_upsert_stream_recovers_from_checkpoint(spark, sf_dir, tmp_path):
    ckp = str(tmp_path / "ckp")
    snap = str(tmp_path / "snap")
    os.makedirs(snap, exist_ok=True)

    # phase 1: crash after 2 committed epochs (source is 4 files at
    # maxFilesPerTrigger=1, so 2 epochs is genuinely mid-run)
    out = upsert_snapshot_stream_recoverable(
        spark, sf_dir, ckp, snap, crash_after_epochs=2
    )
    assert out is None  # the injected crash killed the query

    ledger_path = os.path.join(snap, "_ledger.json")
    with open(ledger_path) as fh:
        led1 = {int(k): v for k, v in json.load(fh).items()}
    assert len(led1) == 2, led1  # exactly the committed prefix
    assert sorted(led1) == [0, 1]

    # the half-way snapshot must NOT already equal the full oracle —
    # otherwise the restart below proves nothing
    partial = spark.read.parquet(led1[max(led1)])
    oracle = _batch_oracle(spark, sf_dir)
    assert partial.count() <= oracle.count()

    # phase 2: restart with the SAME checkpoint + ledger — no crash
    final = upsert_snapshot_stream_recoverable(spark, sf_dir, ckp, snap)
    assert final is not None

    with open(ledger_path) as fh:
        led2 = {int(k): v for k, v in json.load(fh).items()}
    # committed epochs were not re-delivered; only the tail was run
    assert sorted(led2) == [0, 1, 2, 3], led2
    assert all(led2[e] == led1[e] for e in led1)

    # drained snapshot == batch oracle, row for row
    got = {tuple(r) for r in final.collect()}
    want = {tuple(r) for r in oracle.collect()}
    assert got == want
    assert len(got) == oracle.count()


def test_replayed_epoch_is_idempotent(spark, sf_dir, tmp_path):
    """Crash DURING epoch 2 semantics: foreachBatch may write the
    snapshot and die before the checkpoint commit, so the restart
    replays epoch 2. The ledger design must absorb that — re-running
    an epoch against the highest ledger entry BELOW it overwrites the
    same output from the same base."""
    ckp = str(tmp_path / "ckp")
    snap = str(tmp_path / "snap")
    os.makedirs(snap, exist_ok=True)

    out = upsert_snapshot_stream_recoverable(
        spark, sf_dir, ckp, snap, crash_after_epochs=3
    )
    assert out is None
    ledger_path = os.path.join(snap, "_ledger.json")
    with open(ledger_path) as fh:
        led = {int(k): v for k, v in json.load(fh).items()}

    # simulate "snapshot written but epoch uncommitted": hand-plant a
    # ledger entry for epoch 3 pointing at a GARBAGE copy of epoch 2 —
    # the replay must overwrite it, not merge on top of it
    import shutil

    fake = os.path.join(snap, "epoch_3")
    shutil.copytree(led[2], fake)
    led[3] = fake
    with open(ledger_path, "w") as fh:
        json.dump({str(k): v for k, v in led.items()}, fh)

    final = upsert_snapshot_stream_recoverable(spark, sf_dir, ckp, snap)
    got = {tuple(r) for r in final.collect()}
    want = {tuple(r) for r in _batch_oracle(spark, sf_dir).collect()}
    assert got == want


def test_genuine_failure_is_not_masked_as_the_injected_crash(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r11: with crash_after_epochs set, a REAL merge_batch bug
    must still raise — only the injected kill may return None.
    Sabotage merge_upsert (used from epoch 1 on) and assert the
    StreamingQueryException escapes instead of being read as the
    injection."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from oracle_vector_search_spark.operators import merge as merge_mod

    def boom(*args, **kwargs):
        raise ValueError("genuine merge bug, not the injection")

    monkeypatch.setattr(merge_mod, "merge_upsert", boom)
    with pytest.raises(StreamingQueryException):
        upsert_snapshot_stream_recoverable(
            spark,
            sf_dir,
            str(tmp_path / "ckp"),
            str(tmp_path / "snap"),
            crash_after_epochs=3,
        )
