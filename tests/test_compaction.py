"""Small-file compaction mechanics (operators/compaction.py).

Content preservation is oracle-checked end-to-end by
``compacted_events_checksum``; this pins the file mechanics: the 64→few
collapse, target-derived file count, and range clustering (disjoint-ish
event_id ranges per output file → zone maps stay selective).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators import compaction


def test_compact_collapses_small_files(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts_ns"
    )
    events.repartition(64).write.parquet(frag)
    assert compaction.data_file_count(frag) == 64

    total = compaction.parquet_bytes(frag)
    n = compaction.compact_parquet(
        spark, frag, dest, target_file_bytes=max(1, total // 4),
        sort_cols=["event_id"],
    )
    got = compaction.data_file_count(dest)
    assert got == n <= 8  # 64 fragments → a handful of files
    # nothing lost
    assert (
        spark.read.parquet(dest).count() == events.count()
    )


def test_compact_range_clusters_sort_key(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts_ns"
    )
    events.repartition(16).write.parquet(frag)
    compaction.compact_parquet(
        spark, frag, dest,
        target_file_bytes=max(1, compaction.parquet_bytes(frag) // 4),
        sort_cols=["event_id"],
    )
    # per-file event_id ranges must not interleave (range partitioning):
    # sort files by their min; each min must exceed the previous max
    stats = (
        spark.read.parquet(dest)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(stats) > 1
    for prev, cur in zip(stats, stats[1:]):
        assert prev["hi"] < cur["lo"]
