"""Iterative label propagation over an arbitrary directed edge list.

The graph-algorithm kernel under ``knn_label_propagation``
(queries/graph_queries.py), factored out so scale probes and future
graph queries share one implementation. Semantics (Zhu & Ghahramani
2002, hard-clamp variant, deterministic):

* seed nodes keep their label forever (clamped);
* each round, every NON-seed node takes the mode of its in-neighbors'
  current labels (NULLs excluded), ties broken by the SMALLEST label;
* a node with no labeled neighbor stays NULL — coverage grows
  monotonically with rounds but never flips a seed.

Scale shape: the edge list is built once (GEMM / ANN tiers for kNN
graphs, per-key self-joins for co-occurrence graphs) and is an at-rest
artifact at 100 TB. Each round is one join + one (node,label) count
aggregation + one mode window: every shuffle carries (node, label)
pairs — graph-sized, never corpus-sized — so round cost is independent
of the corpus the graph was built from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def kcore_peel(
    edges: DataFrame,
    nodes: DataFrame,
    k: int,
    rounds: int,
    node_col: str = "node",
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    with fewer than ``k`` neighbors among the survivors. The kernel
    under ``kcore_embedding_graph`` (queries/graph_queries.py),
    factored out so scale probes and future graph queries share one
    implementation.

    ``edges`` must be the SYMMETRIZED adjacency (src, dst) — both
    directions present for every undirected edge. ``nodes`` carries one
    row per node in ``node_col``. Peeling is monotone deletion, so a
    fixed ``rounds`` unroll past convergence IS the fixpoint (one peel
    round removes at least the current minimum-degree violators; a
    chain of length L fully dissolves in ceil(L/2) rounds).

    Returns (node, in_core boolean).

    Scale shape: each round is two semi-joins against the survivor set
    plus one degree count — every shuffle carries (node) keys only,
    graph-sized, never corpus-sized; ``localCheckpoint`` per round
    keeps the plan flat at any round count (the dedup-fixpoint
    discipline, operators/dedup.py:511).
    """
    all_nodes = nodes.select(F.col(node_col).alias("node"))
    alive = all_nodes
    for _ in range(rounds):
        alive = (
            edges.join(
                alive.select(F.col("node").alias("s")),
                edges.src == F.col("s"),
            )
            .join(
                alive.select(F.col("node").alias("u")),
                edges.dst == F.col("u"),
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("k"))
            .filter(F.col("k") >= k)
            .select("node")
            .localCheckpoint()
        )
    return all_nodes.join(
        alive.select(F.col("node").alias("_a")),
        all_nodes.node == F.col("_a"),
        "left",
    ).select("node", F.col("_a").isNotNull().alias("in_core"))


def propagate_labels(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int,
    node_col: str = "node",
    label_col: str = "label",
    seed_col: str = "is_seed",
) -> DataFrame:
    """Run ``n_iter`` deterministic vote rounds.

    ``nodes``: one row per node with ``node_col``, ``label_col`` (the
    clamped label for seeds, any value for non-seeds) and boolean
    ``seed_col``. ``edges``: (src, dst) — dst's label votes for src.
    Returns (node, is_seed, lbl) with lbl NULL where propagation never
    reached.
    """
    d = nodes.select(
        F.col(node_col).alias("_n"),
        F.col(label_col).alias("_true"),
        F.col(seed_col).alias("_seed"),
    )
    lbl = d.select(
        F.col("_n").alias("node"),
        F.when(F.col("_seed"), F.col("_true")).alias("lbl"),
    )
    for _ in range(n_iter):
        votes = (
            edges.join(
                lbl.select(
                    F.col("node").alias("_dst"), F.col("lbl")
                ),
                edges.dst == F.col("_dst"),
            )
            .filter(F.col("lbl").isNotNull())
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w_mode = Window.partitionBy("src").orderBy(
            F.desc("c"), F.asc("lbl")
        )
        mode = (
            votes.withColumn("rn", F.row_number().over(w_mode))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("_mn"), F.col("lbl").alias("_ml"))
        )
        lbl = d.join(mode, d._n == F.col("_mn"), "left").select(
            F.col("_n").alias("node"),
            F.when(F.col("_seed"), F.col("_true"))
            .otherwise(F.col("_ml"))
            .alias("lbl"),
        )
    return d.join(lbl, d._n == lbl.node).select(
        "node", F.col("_seed").alias("is_seed"), "lbl"
    )
