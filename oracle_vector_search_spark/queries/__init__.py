"""Named query registry — the engine's declared, oracle-checked surface.

Every operator from SURVEY.md §2 lands here as a named entry:
``name -> (spark_fn, oracle_sql | None)`` where ``spark_fn(spark, sf_dir)``
returns a DataFrame and ``oracle_sql`` is equivalent ANSI SQL runnable by
DuckDB over the same parquet tables. ``None`` marks genuinely
non-SQL-expressible ops (streaming/stateful) — the driver then records a
rows-only check.

Column-name / type discipline (the driver hash-compares): alias every
computed column identically on both sides; cast away DuckDB's HUGEINT
(``sum(int)``) and BIGINT ``row_number()``; round all float scores to 6
decimals and tie-break orderings by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (fn, oracle_sql or None)
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    """Decorator: add a query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def load_all_modules() -> None:
    """Import every query module so registration side effects run."""
    from oracle_vector_search_spark.queries import (  # noqa: F401
        vector_queries,
    )
    for mod in (
        "ann_queries",
        "relational_queries",
        "relational2_queries",
        "temporal_queries",
        "text_queries",
        "dedup_queries",
        "grouped_map_queries",
        "sketch_queries",
        "tpch_queries",
        "pipeline_queries",
        "streaming_queries",
    ):
        try:
            __import__(f"oracle_vector_search_spark.queries.{mod}")
        except ImportError:
            pass


def queries() -> dict[str, SparkQuery]:
    load_all_modules()
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all_modules()
    return {
        name: sql for name, (_, sql) in REGISTRY.items() if sql is not None
    }
