"""Graph analytics over the event-transition graph — iterative
algorithms with EXACT oracles.

The graph: nodes are event types; a weighted edge (src → dst, w) is
"users moved from an src-event to a dst-event w times" (the same
lead-bigram convention as ``session_path_bigrams``, minus
sessionization). On this graph we run a fixed-iteration PageRank —
the canonical "Spark can do iterative algorithms" demonstration with
a value-exact oracle: because the iteration count is FIXED, the DuckDB
side unrolls the same three update steps as chained CTEs and the
result is comparable to the 6-decimal policy.

Scale shape: the expensive part (edge extraction) is one window pass
sharing a single shuffle on user_id plus one count aggregation — and
it runs ONCE per session, persisted as an at-rest edge/node parquet
pair (the LSH-bucket / pipeline-index build-once-query-many story).
Every PageRank run reads the tiny graph tables and iterates with
joins; at 100 TB the same split holds: edge extraction scales with
data and is a nightly-build cost, iteration cost scales with the
(much smaller) graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.queries import register

_DAMPING = 0.85
_N_ITER = 3

# (applicationId, sf_dir) -> scratch path of the extracted edge list.
# The graph is an at-rest artifact (same build-once/query-many story as
# the LSH buckets and the pipeline index): edge extraction scans the
# corpus ONCE per session; every PageRank run afterwards reads the tiny
# parquet instead of re-deriving the window pass.
_GRAPH_CACHE: dict[tuple[str, str], str] = {}


def _graph_tables(spark: SparkSession, sf_dir: str):
    """Extract the transition graph once per session and persist it at
    rest; return ``(edges, nodes)`` read back from parquet.

    Nodes come from the EVENTS table (distinct event_type), not from
    the edge endpoints — an isolated type (no transitions) is still a
    PageRank node, exactly as the oracle defines it."""
    from oracle_vector_search_spark.scratch import scratch_dir

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _GRAPH_CACHE.get(key)
    if path is None:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy(
            F.expr("ts_ns div 1000"), "event_id"
        )
        steps = ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        edges = (
            steps.filter(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
        )
        nodes = ev.select(F.col("event_type").alias("node")).distinct()
        path = scratch_dir("ovs_graph_")
        edges.write.mode("overwrite").parquet(path + "/edges")
        nodes.write.mode("overwrite").parquet(path + "/nodes")
        _GRAPH_CACHE[key] = path
    return (
        spark.read.parquet(path + "/edges"),
        spark.read.parquet(path + "/nodes"),
    )


def _pagerank_oracle(n_iter: int) -> str:
    """Unroll ``n_iter`` PageRank updates as chained CTEs (DuckDB)."""
    ctes = [
        """
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_ns(ts) // 1000 AS ts_us
  FROM events
), steps AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id) AS dst
  FROM e
), edges AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM steps WHERE dst IS NOT NULL GROUP BY src, dst
), nodes AS (
  SELECT DISTINCT event_type AS node FROM events
), nc AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
), outdeg AS (
  SELECT src, CAST(sum(w) AS DOUBLE) AS wout FROM edges GROUP BY src
), pr0 AS (
  SELECT node, CAST(1 AS DOUBLE) / nc.n AS pr FROM nodes, nc
)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", pr{i} AS (
  SELECT nd.node,
         CAST({1 - _DAMPING} AS DOUBLE) / nc.n
           + CAST({_DAMPING} AS DOUBLE)
             * coalesce(m.mass, CAST(0 AS DOUBLE)) AS pr
  FROM nodes nd CROSS JOIN nc
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr * (e.w / o.wout)) AS mass
    FROM pr{i - 1} p
    JOIN edges e  ON e.src = p.node
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst
  ) m ON m.node = nd.node
)"""
        )
    return "".join(ctes) + (
        f"\nSELECT node AS event_type, round(pr, 6) AS pagerank"
        f" FROM pr{n_iter}"
    )


@register("pagerank_event_transitions", _pagerank_oracle(_N_ITER))
def pagerank_event_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations, uniform init) over
    the event-type transition graph. Dangling mass is dropped
    identically on both sides (no out-edges → contributes nothing),
    so the oracle stays exact without a redistribution term."""
    edges, nodes = _graph_tables(spark, sf_dir)
    nc = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    outdeg = edges.groupBy("src").agg(
        F.sum("w").cast("double").alias("wout")
    )
    pr = nodes.crossJoin(F.broadcast(nc)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    contrib_edges = edges.join(outdeg, "src").select(
        F.col("src"),
        F.col("dst"),
        (F.col("w") / F.col("wout")).alias("share"),
    )
    for _ in range(_N_ITER):
        mass = (
            pr.join(contrib_edges, pr.node == contrib_edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("share")).alias("mass"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(nc))
            .join(mass, "node", "left")
            .select(
                "node",
                (
                    F.lit(1 - _DAMPING) / F.col("n")
                    + F.lit(_DAMPING)
                    * F.coalesce("mass", F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select(
        F.col("node").alias("event_type"),
        F.round("pr", 6).alias("pagerank"),
    )
