"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``oracle_vector_search_spark.queries`` — one
registered entry per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_vector_search_spark import queries as _registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: exact cosine top-5 kNN over the
    embeddings table, decorated with neighbor metadata — the reference's
    normalize → IndexFlatIP search → metadata-join chain
    (/root/reference/app.py:139-153) as one Spark DataFrame plan."""
    from oracle_vector_search_spark.queries.vector_queries import (
        q_knn_with_metadata,
    )

    return q_knn_with_metadata(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    return _registry.oracle_sql()
