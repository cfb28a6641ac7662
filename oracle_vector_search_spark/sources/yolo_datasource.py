"""Custom Python Data Source (Spark 4 API) for YOLO label directories.

The reference ingests YOLO labels by globbing ``*.txt`` and reading
them line-by-line in driver Python (/root/reference/build_faiss_db.py:
171-181). This connector makes that a first-class, partition-parallel
Spark source: ``spark.read.format("yolo_labels").load(dir)`` yields one
row per label line with its image stem and 0-based line ordinal —
downstream parsing stays in ``operators.ingest.parse_yolo_labels``
(permissive, F6).

Why a Data Source and not ``spark.read.text``: the stem must come from
the FILENAME, files are tiny and numerous (one per image), and the
connector boundary is where a 100 TB deployment would swap the local
glob for an object-store listing. Partition planning chunks the file
list so thousands of small files become a bounded number of tasks —
the executor-side reader never lists the directory itself.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class YoloLabelDataSource(DataSource):
    """``format("yolo_labels")``; option ``path`` = label directory,
    option ``filesPerPartition`` = chunk size (default 64)."""

    @classmethod
    def name(cls) -> str:
        return "yolo_labels"

    def schema(self) -> str:
        return "stem string, line_no int, value string"

    def reader(self, schema) -> "YoloLabelReader":
        return YoloLabelReader(self.options)


class _FileChunk(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class YoloLabelReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("yolo_labels source requires option 'path'")
        self.files_per_partition = int(
            options.get("filesPerPartition", "64")
        )

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "*.txt")))
        k = self.files_per_partition
        chunks = [files[i : i + k] for i in range(0, len(files), k)]
        return [_FileChunk(c) for c in chunks] or [_FileChunk([])]

    def read(self, partition: _FileChunk):
        for fpath in partition.files:
            stem = os.path.splitext(os.path.basename(fpath))[0]
            # Permissive at the IO tier too: an unreadable file is
            # skipped, not fatal (F6 discipline at file granularity).
            try:
                with open(fpath, encoding="utf-8", errors="replace") as f:
                    for i, line in enumerate(f):
                        line = line.rstrip("\n")
                        if line:
                            yield (stem, i, line)
            except OSError:
                continue


def register_yolo_source(spark) -> None:
    """Idempotent per-session registration.

    Only the already-registered collision is swallowed; any other
    failure (missing Data Source API, bad class) propagates here
    instead of surfacing later as a confusing 'format not found' at
    read time (ADVICE r4)."""
    try:
        spark.dataSource.register(YoloLabelDataSource)
    except Exception as e:  # noqa: BLE001 — filtered by message below
        msg = str(e).lower()
        if "already" in msg or "exists" in msg:
            return
        raise
