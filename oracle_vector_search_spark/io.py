"""Table loading for the driver-generated synthetic fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

Parquet is the engine's native storage: columnar, predicate-pushdown and
column-pruning friendly (Catalyst pushes filters into the scan), splittable
for parallel reads at cluster scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's timestamp
    type (µs) cannot hold — read it as a long (``nanosAsLong``) and expose
    BOTH ``ts_ns BIGINT`` (exact, for arithmetic/oracle output) and ``ts
    TIMESTAMP`` (µs-truncated, for window/streaming functions; hour and
    second boundaries are µs-aligned so truncation never flips a bucket).
    """
    from pyspark.sql import functions as F

    # Oracle comparability + determinism: wall-clock↔epoch conversions
    # (NTZ casts, unix_micros) must not depend on the host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.read.parquet(path)
            .withColumnRenamed("ts", "ts_ns")
            .withColumn(
                "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
            )
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table; also registers each as a temp view so the
    SQL surface (spark.sql) can reference them by name."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
