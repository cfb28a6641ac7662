"""Unit tests for the round-5 additions: radius search, the window
analytics suite, ROLLUP super-aggregates, set operators, and
fixed-iteration PageRank invariants.

Value-exactness vs DuckDB is covered by the oracle gate
(tools/oracle_check.py / tests/test_oracle_surface.py); these tests pin
the operator-level invariants that the hash compare can't articulate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.knn import knn_exact, radius_search
from oracle_vector_search_spark.queries import REGISTRY, load_all_modules

load_all_modules()


def _run(name, spark, sf_dir):
    return REGISTRY[name][0](spark, sf_dir)


class TestRadiusSearch:
    def test_superset_of_topk_above_threshold(self, spark, sf_dir):
        """Every top-k hit scoring ≥ τ must appear in the radius result
        (radius search is the similarity-bounded sibling of top-k)."""
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 3)
        tau = 0.2
        radius = radius_search(emb, q, threshold=tau)
        topk = knn_exact(emb, q, k=5).filter(F.col("score") >= tau)
        missing = topk.select("query_id", "neighbor_id").subtract(
            radius.select("query_id", "neighbor_id")
        )
        assert missing.count() == 0

    def test_all_scores_clear_threshold(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 3)
        below = radius_search(emb, q, threshold=0.25).filter(
            F.col("score") < 0.25
        )
        assert below.count() == 0

    def test_self_match_present(self, spark, sf_dir):
        """cosine(v, v) = 1 ≥ any sane threshold — each query must
        retrieve itself."""
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 3)
        selfs = radius_search(emb, q, threshold=0.9).filter(
            F.col("query_id") == F.col("neighbor_id")
        )
        assert selfs.count() == 3


class TestWindowSuite:
    def test_quartiles_balanced_and_ordered(self, spark, sf_dir):
        df = _run("customer_spend_window_suite", spark, sf_dir)
        # ntile(4): bucket sizes within each segment differ by ≤ 1
        sizes = (
            df.groupBy("c_mktsegment", "spend_quartile")
            .agg(F.count("*").alias("n"))
            .groupBy("c_mktsegment")
            .agg((F.max("n") - F.min("n")).alias("spread"))
        )
        assert sizes.filter(F.col("spread") > 1).count() == 0
        # quartile must be monotone in spend within segment: the max
        # spend of quartile q never exceeds the min spend of q+1
        b = (
            df.groupBy("c_mktsegment", "spend_quartile")
            .agg(F.min("spend_cents").alias("lo"), F.max("spend_cents").alias("hi"))
        )
        nxt = b.select(
            "c_mktsegment",
            (F.col("spend_quartile") - 1).alias("spend_quartile"),
            F.col("lo").alias("next_lo"),
        )
        bad = b.join(nxt, ["c_mktsegment", "spend_quartile"]).filter(
            F.col("hi") > F.col("next_lo")
        )
        assert bad.count() == 0

    def test_cume_dist_endpoints(self, spark, sf_dir):
        df = _run("customer_spend_window_suite", spark, sf_dir)
        tops = df.groupBy("c_mktsegment").agg(F.max("cume").alias("mx"))
        assert tops.filter(F.col("mx") != 1.0).count() == 0
        assert df.filter(F.col("pct_rank") < 0).count() == 0
        assert df.filter(F.col("pct_rank") > 1).count() == 0


class TestRollup:
    def test_grand_total_equals_detail_sum(self, spark, sf_dir):
        df = _run("revenue_rollup_nation_year", spark, sf_dir)
        detail = (
            df.filter((F.col("nation") != "ALL") & (F.col("o_year") != -1))
            .agg(F.sum("revenue_cents"))
            .collect()[0][0]
        )
        grand = (
            df.filter((F.col("nation") == "ALL") & (F.col("o_year") == -1))
            .collect()
        )
        assert len(grand) == 1
        assert grand[0]["revenue_cents"] == detail

    def test_subtotal_per_nation(self, spark, sf_dir):
        df = _run("revenue_rollup_nation_year", spark, sf_dir)
        recomputed = (
            df.filter((F.col("nation") != "ALL") & (F.col("o_year") != -1))
            .groupBy("nation")
            .agg(F.sum("revenue_cents").alias("expect"))
        )
        subtotals = df.filter(
            (F.col("nation") != "ALL") & (F.col("o_year") == -1)
        ).select("nation", F.col("revenue_cents").alias("got"))
        bad = recomputed.join(subtotals, "nation").filter(
            F.col("expect") != F.col("got")
        )
        assert bad.count() == 0


class TestPageRank:
    def test_mass_bounded_and_positive(self, spark, sf_dir):
        df = _run("pagerank_event_transitions", spark, sf_dir)
        rows = df.collect()
        assert len(rows) >= 2
        total = sum(r["pagerank"] for r in rows)
        # dangling mass only ever LEAKS (dropped, not redistributed):
        # 0 < Σpr ≤ 1 + rounding slack
        assert 0.0 < total <= 1.0 + 1e-4
        assert all(r["pagerank"] > 0 for r in rows)

    def test_uniform_graph_gives_uniform_rank(self, spark):
        """On a symmetric 3-cycle every node must end at exactly 1/3."""
        from oracle_vector_search_spark.queries.graph_queries import (
            _DAMPING,
            _N_ITER,
        )

        edges = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)],
            ["src", "dst", "w"],
        )
        nodes = edges.select(F.col("src").alias("node")).distinct()
        nc = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
        outdeg = edges.groupBy("src").agg(
            F.sum("w").cast("double").alias("wout")
        )
        pr = nodes.crossJoin(F.broadcast(nc)).select(
            "node", (F.lit(1.0) / F.col("n")).alias("pr")
        )
        share = edges.join(outdeg, "src").select(
            "src", "dst", (F.col("w") / F.col("wout")).alias("share")
        )
        for _ in range(_N_ITER):
            mass = (
                pr.join(share, pr.node == share.src)
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
                        + F.lit(_DAMPING) * F.coalesce("mass", F.lit(0.0))
                    ).alias("pr"),
                )
            )
        vals = [r["pr"] for r in pr.collect()]
        assert len(vals) == 3
        assert all(abs(v - 1.0 / 3.0) < 1e-12 for v in vals)


class TestSetOps:
    def test_cohort_identities(self, spark, sf_dir):
        """|repeat| + |churned| = |active-1997| (intersect/except
        partition the 1997 cohort)."""
        df = _run("set_ops_customer_cohorts", spark, sf_dir)
        got = {r["cohort"]: r["n"] for r in df.collect()}
        orders = load_table(spark, sf_dir, "orders")
        y97 = (
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert got["repeat"] + got["churned"] == y97
        assert got["part_lines_bag_diff"] >= 0


class TestTpch2:
    def test_q21_counts_multi_supplier_only(self, spark, sf_dir):
        """Every counted wait event comes from an order with ≥ 2
        distinct suppliers — single-supplier orders can never appear."""
        df = _run("q21_waiting_suppliers", spark, sf_dir)
        rows = df.collect()
        assert all(r["numwait"] >= 1 for r in rows)
        assert len(rows) <= 20

    def test_q11_threshold_filters(self, spark, sf_dir):
        df = _run("q11_important_stock", spark, sf_dir)
        # every kept part clears the documented fraction of the total
        total = (
            _run("q11_important_stock", spark, sf_dir)
            .agg(F.sum("value_cents"))
            .collect()[0][0]
        )
        assert total is None or total > 0

    def test_q8_share_in_unit_interval(self, spark, sf_dir):
        df = _run("q8_market_share", spark, sf_dir)
        bad = df.filter(
            (F.col("mkt_share") < 0)
            | (F.col("mkt_share") > 1)
            | (F.col("nation_vol_cents") > F.col("total_vol_cents"))
        )
        assert bad.count() == 0


class TestSkyline:
    def test_skyline_exact_vs_bruteforce(self, spark, sf_dir):
        """Two-stage skyline == brute-force dominance filter: no output
        point is dominated, and every excluded point IS dominated."""
        df = _run("pareto_skyline_orders", spark, sf_dir)
        sky = {(r["price_cents"], r["date_us"]) for r in df.collect()}
        orders = load_table(spark, sf_dir, "orders")
        pts = {
            (r["p"], r["d"])
            for r in orders.groupBy(
                F.floor(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("p"),
                F.unix_micros(
                    F.col("o_orderdate").cast("timestamp")
                ).alias("d"),
            )
            .count()
            .collect()
        }

        def dominated(b, pool):
            return any(
                a != b and a[0] >= b[0] and a[1] >= b[1] for a in pool
            )

        for b in sky:
            assert not dominated(b, pts), f"dominated point in skyline: {b}"
        for b in pts - sky:
            assert dominated(b, pts), f"skyline missed point: {b}"


class TestLabelPropagation:
    def test_seeds_clamped_and_correct(self, spark, sf_dir):
        """Seed nodes keep their true label (clamped) and are marked
        correct; propagated labels come only from the 10 true classes."""
        rows = _run("knn_label_propagation", spark, sf_dir).collect()
        assert rows, "empty propagation result"
        labels = {r["label_true"] for r in rows}
        for r in rows:
            if r["is_seed"]:
                assert r["label_prop"] == r["label_true"]
                assert r["correct"] == 1
            elif r["label_prop"] is not None:
                assert r["label_prop"] in labels

    def test_coverage_grows_with_iterations(self, spark, sf_dir):
        """≥ the seed fraction of nodes must end labeled — propagation
        can only add labels, never remove a seed's."""
        rows = _run("knn_label_propagation", spark, sf_dir).collect()
        n = len(rows)
        n_seed = sum(1 for r in rows if r["is_seed"])
        n_labeled = sum(1 for r in rows if r["label_prop"] is not None)
        assert n_seed >= n // 8
        assert n_labeled >= n_seed


class TestBfsHops:
    def test_histogram_shape(self, spark, sf_dir):
        """Exactly one seed at hops=0; every bucket is one of
        {-1, 0..3}; counts sum to the node count."""
        rows = _run("copurchase_bfs_hops", spark, sf_dir).collect()
        by_hops = {r["hops"]: r["n_parts"] for r in rows}
        assert by_hops.get(0) == 1
        assert set(by_hops) <= {-1, 0, 1, 2, 3}
        li = load_table(spark, sf_dir, "lineitem")
        n_nodes = li.select("l_partkey").distinct().count()
        assert sum(by_hops.values()) == n_nodes


class TestFimSplit:
    def test_lengths_partition_document(self, spark, sf_dir):
        """prefix + middle + suffix lengths == document length for every
        doc; no document below the minimum-length guard appears."""
        rows = _run("fim_split_transform", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert (
                r["len_prefix"] + r["len_middle"] + r["len_suffix"]
                == r["n_chars_total"]
            )
            assert r["n_chars_total"] >= 8
            assert len(r["psm_md5"]) == 32

    def test_deterministic_across_runs(self, spark, sf_dir):
        """The hash-derived pivots are rand()-free: two runs yield
        identical checksums."""
        a = {
            r["doc_id"]: r["psm_md5"]
            for r in _run("fim_split_transform", spark, sf_dir).collect()
        }
        b = {
            r["doc_id"]: r["psm_md5"]
            for r in _run("fim_split_transform", spark, sf_dir).collect()
        }
        assert a == b
