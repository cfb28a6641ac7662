"""Permissive JSONL ingestion — the error-tolerant text-corpus source.

Web-scale document corpora arrive as JSONL with a long tail of broken
lines (truncated uploads, encoding damage, mid-record splits). The F6
malformed-tolerance rule the reference applies to YOLO label lines
(operators/ingest.py parse_yolo_labels) applies here too: one bad line
must never kill the stage. Spark's PERMISSIVE mode + an explicit
``_corrupt_record`` column gives exactly that — bad lines land in the
corrupt column with data columns NULL, good lines parse, and the
pipeline filters/quarantines rather than crashes.

Scale notes: the explicit schema avoids the schema-inference extra pass
over 100 TB; JSONL is splittable by line so files parallelize; the
parsed frame is cached before audit counts because Spark disallows
plans referencing ONLY the corrupt column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "n_chars long, _corrupt_record string"
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents JSONL directory permissively. Returns the
    parsed frame with ``_corrupt_record`` non-NULL for unparseable
    lines (cached — see module docstring)."""
    return (
        spark.read.schema(DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
