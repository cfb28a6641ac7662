"""Small-file compaction — the table-maintenance operator every 100 TB
warehouse runs nightly.

Streaming sinks, CDC merges and incremental upserts (operators/merge.py,
operators/index_maint.py) all fragment tables into many small files;
small files destroy scan throughput (per-file open cost, tiny row
groups, metadata bloat) and executor parallelism degenerates into task
overhead. Compaction rewrites a table into few near-target-size files
WITHOUT changing its content — content preservation is what the
``compacted_events_checksum`` oracle checks.

Design: size the output file count from the REAL input bytes (never a
guess), and rewrite with ``repartitionByRange`` on a sort key so the
compacted files stay clustered — preserving min/max zone-map locality
for data skipping — falling back to round-robin ``repartition`` when no
key is given. At warehouse scale the byte-counting step reads the file
listing from the table format's manifests (Iceberg/Delta) or a Hadoop
FS listing; the local stand-in walks the directory.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def parquet_bytes(path: str) -> int:
    """Total bytes of the parquet data files under ``path`` (local-FS
    stand-in for a manifest/FS listing)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def target_file_count(total_bytes: int, target_file_bytes: int) -> int:
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite the parquet table at ``src_path`` into
    ``ceil(actual_bytes / target_file_bytes)`` files at ``dest_path``.
    Returns the planned file count. Range-partitioning on ``sort_cols``
    keeps the rewritten files clustered (zone-map friendly); without
    keys, round-robin spreads rows evenly."""
    df = spark.read.parquet(src_path)
    n = target_file_count(parquet_bytes(src_path), target_file_bytes)
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dest_path)
    return n


def data_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
