"""Hand-graph semantics for the degree-ordered triangle kernel
(operators/propagation.py:triangle_counts) and the invariants of the
three r14 registry queries at the smallest fixture. The cross-engine
value check lives in the DuckDB oracle gate; these tests pin the
SEMANTICS on graphs whose triangle counts are known by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.operators.propagation import (
    triangle_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(spark, edges):
    """Unique undirected edges with left < right (the operator
    contract)."""
    rows = [tuple(sorted(e)) for e in edges]
    assert len(set(rows)) == len(rows), "test graph has duplicate edges"
    return spark.createDataFrame(rows, "left_id long, right_id long")


def _by_node(df):
    return {
        r["node"]: (r["degree"], r["n_tri"]) for r in df.collect()
    }


def test_triangle_k4_complete_graph(spark):
    """K4: every node has degree 3 and sits in C(3,2)=3 triangles;
    the graph holds exactly 4 triangles total."""
    out = _by_node(
        triangle_counts(
            _pairs(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]),
            id_col="node",
        )
    )
    assert out == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (3, 3)}


def test_triangle_path_has_none(spark):
    """A path graph is triangle-free at every node."""
    out = _by_node(
        triangle_counts(
            _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), id_col="node"
        )
    )
    assert out == {1: (1, 0), 2: (2, 0), 3: (2, 0), 4: (2, 0), 5: (1, 0)}


def test_triangle_shared_edge_counted_once_each(spark):
    """Two triangles sharing edge (1,2): the shared endpoints see 2
    triangles, the apexes 1 — i.e. each triangle is produced exactly
    once (the orientation's no-double-count property)."""
    out = _by_node(
        triangle_counts(
            _pairs(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]),
            id_col="node",
        )
    )
    assert out == {1: (3, 2), 2: (3, 2), 3: (2, 1), 4: (2, 1)}


def test_triangle_star_hub_skew(spark):
    """A star (hub 1 with 6 leaves) plus one leaf-leaf edge: exactly
    one triangle, at (1, 2, 3). The hub's high degree must not inflate
    counts — the degree-ordered orientation enumerates the wedge at
    the low-degree endpoint, which is also the scale story."""
    edges = [(1, k) for k in range(2, 8)] + [(2, 3)]
    out = _by_node(triangle_counts(_pairs(spark, edges), id_col="node"))
    assert out[1] == (6, 1)
    assert out[2] == (2, 1)
    assert out[3] == (2, 1)
    for leaf in (4, 5, 6, 7):
        assert out[leaf] == (1, 0)


def test_triangle_query_isolated_nodes_zero(spark):
    """The registry query reports every sampled embedding node; nodes
    outside any edge come back (degree 0, 0 triangles, coeff 0.0), and
    the coefficient stays in [0, 1] with the deg<2 guard exact."""
    from oracle_vector_search_spark.queries.graph_queries import (
        triangle_count_graph,
    )

    rows = triangle_count_graph(spark, SF_DIR).collect()
    assert rows, "sampled graph is empty"
    for r in rows:
        if r["degree"] < 2:
            assert r["n_triangles"] == 0
            assert r["clustering_coeff"] == 0.0
        else:
            max_tri = r["degree"] * (r["degree"] - 1) // 2
            assert 0 <= r["n_triangles"] <= max_tri
            assert 0.0 <= r["clustering_coeff"] <= 1.0


def test_bloom_audit_no_false_negatives(spark):
    """THE Bloom property: an exact duplicate can never be
    bloom-negative, so per source n_exact_dup <= n_bloom_positive and
    n_false_positive == n_bloom_positive - n_exact_dup exactly."""
    from oracle_vector_search_spark.queries.sketch_queries import (
        bloom_dedup_fpr_audit,
    )

    rows = bloom_dedup_fpr_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_exact_dup"] <= r["n_bloom_positive"], r
        assert (
            r["n_false_positive"]
            == r["n_bloom_positive"] - r["n_exact_dup"]
        ), r
        assert r["n_bloom_positive"] <= r["n_probed"]
    # the planted re-keyed train copies keep the exact-dup (and hence
    # the no-false-negative) branch LIVE, and the %7 split probes
    # every source in the fixture's src{doc_id % 20} assignment
    assert sum(r["n_exact_dup"] for r in rows) > 0
    assert len(rows) == 20


def test_curriculum_stage_major_permutation(spark):
    """curriculum_pos is a 1..N permutation and stage-major: every
    stage-0 position precedes every stage-1 position, etc. Within a
    stage the order follows the portable hash (spot-checked via
    monotone hv along positions)."""
    from oracle_vector_search_spark.queries.training_queries import (
        curriculum_quality_order,
    )

    rows = curriculum_quality_order(spark, SF_DIR).collect()
    n = len(rows)
    assert sorted(r["curriculum_pos"] for r in rows) == list(
        range(1, n + 1)
    )
    stages = [r["stage"] for r in sorted(rows, key=lambda r: r["curriculum_pos"])]
    assert stages == sorted(stages), "positions are not stage-major"
    assert len(set(stages)) >= 2, "thresholds degenerate at fixture"


def test_curriculum_partitioning_invariant(spark):
    """The permutation must be identical under a different input
    partitioning (the two-phase rank determinism contract)."""
    from oracle_vector_search_spark.queries.training_queries import (
        curriculum_quality_order,
    )

    base = {
        r["doc_id"]: r["curriculum_pos"]
        for r in curriculum_quality_order(spark, SF_DIR).collect()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {
            r["doc_id"]: r["curriculum_pos"]
            for r in curriculum_quality_order(spark, SF_DIR).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert base == again
