"""Streaming operator tests — including TRUE multi-batch execution
(maxFilesPerTrigger over a multi-file source) to exercise the
per-batch top-k merge, which single-file sources never do."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from oracle_vector_search_spark.functions.vector import (
    as_double_array,
    cosine_similarity,
)
from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.knn import knn_exact


def test_streaming_knn_multibatch_merge(spark, sf_dir):
    """Split the query set across 4 parquet files, stream with
    maxFilesPerTrigger=1 (4 separate micro-batches), and check the
    accumulated per-batch top-k merge equals the batch-exact answer."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 12)
    expected = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in knn_exact(emb, queries, k=5).collect()
    }

    with tempfile.TemporaryDirectory() as d:
        # 4 files → 4 micro-batches
        queries.repartition(4).write.mode("overwrite").parquet(f"{d}/q")
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        )
        qstream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/q")
        )
        index_df = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            as_double_array("embedding").alias("v_vec"),
        )
        candidates: list[tuple] = []
        batch_count = [0]

        def score(batch_df, epoch_id):
            if batch_df.isEmpty():
                return
            batch_count[0] += 1
            q = batch_df.select(
                F.col("vec_id").alias("query_id"),
                as_double_array("embedding").alias("q_vec"),
            )
            w = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("neighbor_id")
            )
            topk = (
                index_df.join(F.broadcast(q))
                .select(
                    "query_id",
                    "neighbor_id",
                    F.round(
                        cosine_similarity("q_vec", "v_vec"), 6
                    ).alias("score"),
                )
                .withColumn("r", F.row_number().over(w))
                .filter(F.col("r") <= 5)
                .select("query_id", "neighbor_id", "score")
            )
            candidates.extend(map(tuple, topk.collect()))

        q = qstream.writeStream.foreachBatch(score).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    assert batch_count[0] >= 2, "expected multiple micro-batches"
    got = set(candidates)
    assert got == expected  # disjoint query batches → no cross-batch merge
    assert len(got) == 12 * 5


def test_watermark_drops_late_data(spark):
    """Watermark semantics: a record older than watermark-delay behind
    the max seen event time is dropped from append-mode aggregation."""
    import pandas as pd

    with tempfile.TemporaryDirectory() as d:
        early = pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    ["2024-01-01 00:05:00", "2024-01-01 03:00:00"]
                ),
                "v": [1.0, 1.0],
            }
        )
        late = pd.DataFrame(
            {
                # arrives AFTER max event time 03:00; watermark = 02:00
                # with 1h delay → a 00:10 record is too late
                "ts": pd.to_datetime(
                    ["2024-01-01 00:10:00", "2024-01-01 03:10:00"]
                ),
                "v": [100.0, 1.0],
            }
        )
        # two explicit passes: batch 2's file only appears after batch 1
        # completed and advanced the watermark to 02:00
        spark.createDataFrame(early).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/s")

        schema = "ts timestamp, v double"
        stream = spark.readStream.schema(schema).parquet(f"{d}/s")
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.sum("v").alias("total"))
        )
        name = f"wm_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 1: watermark → 02:00
            spark.createDataFrame(late).coalesce(1).write.mode(
                "append"
            ).parquet(f"{d}/s")
            q.processAllAvailable()  # batch 2: 00:10 record is late
        finally:
            q.stop()
        finalized = {
            (r["window"].start.isoformat(), r["total"])
            for r in spark.table(name).collect()
        }
    # the 00:00 window finalized after batch 1 with total=1.0;
    # the late v=100 record must NOT appear anywhere
    assert not any(t >= 100 for _, t in finalized), finalized
