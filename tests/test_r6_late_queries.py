"""Invariant tests for the round-6 late additions: class-balanced
sampling, n-gram novelty scoring, and the streaming trending top-k.

Value-exactness vs DuckDB is covered by the oracle gate; these pin the
operator-level properties the hash compare can't articulate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.queries import REGISTRY, load_all_modules

load_all_modules()


def _run(name, spark, sf_dir):
    return REGISTRY[name][0](spark, sf_dir)


class TestClassBalancedSample:
    def test_cap_and_totals(self, spark, sf_dir):
        """n_kept = min(cap, n_total) per class; totals match the raw
        per-lang counts; kept_xor is 0 only when nothing was kept."""
        rows = _run("class_balanced_sample", spark, sf_dir).collect()
        doc = load_table(spark, sf_dir, "documents")
        truth = dict(
            doc.groupBy("lang").count().rdd.map(tuple).collect()
        )
        assert {r["lang"] for r in rows} == set(truth)
        for r in rows:
            assert r["n_total"] == truth[r["lang"]]
            assert r["n_kept"] == min(30, r["n_total"])
            if r["n_kept"] > 0:
                # xor of >=1 distinct nonzero ids is almost surely
                # nonzero; the guard is that the column is populated
                assert r["kept_xor"] is not None


class TestNgramNovelty:
    def test_bounds_and_coverage(self, spark, sf_dir):
        """novelty in [0,1]; n_novel <= n_grams; every document with
        text is scored."""
        rows = _run("doc_ngram_novelty", spark, sf_dir).collect()
        doc_count = load_table(spark, sf_dir, "documents").count()
        assert len(rows) == doc_count
        for r in rows:
            assert 0 <= r["n_novel"] <= r["n_grams"]
            assert 0.0 <= r["novelty"] <= 1.0

    def test_duplicate_doc_has_zero_novelty(self, spark, sf_dir):
        """Exact-duplicate documents (same normalized text) can have no
        df=1 shingles, hence novelty 0 — the property that makes the
        score a dedup signal."""
        doc = load_table(spark, sf_dir, "documents")
        norm = F.trim(
            F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
        )
        dup_ids = {
            r["doc_id"]
            for r in doc.select("doc_id", norm.alias("n"))
            .withColumn(
                "c", F.count(F.lit(1)).over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("n")
                )
            )
            .filter(F.col("c") > 1)
            .collect()
        }
        if not dup_ids:
            return  # fixture has no exact dups at this SF
        by_id = {
            r["doc_id"]: r["novelty"]
            for r in _run("doc_ngram_novelty", spark, sf_dir).collect()
        }
        for d in dup_ids:
            assert by_id[d] == 0.0


class TestStreamingTrending:
    def test_rank_bounds_and_tiebreak(self, spark, sf_dir):
        """<=3 rows per window, rank 1..3 without gaps, counts
        non-increasing within a window."""
        rows = _run("streaming_topk_trending", spark, sf_dir).collect()
        assert rows
        by_w = {}
        for r in rows:
            by_w.setdefault(r["window_start_ns"], []).append(r)
        for w, rs in by_w.items():
            rs.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= 3
            ns = [r["n"] for r in rs]
            assert ns == sorted(ns, reverse=True)


class TestVocabCoverage:
    def test_monotone_and_bounded(self, spark, sf_dir):
        """Coverage is monotone in the cutoff, within [0,1], and the
        covered counts never exceed the total occurrences."""
        rows = _run("vocab_coverage_curve", spark, sf_dir).collect()
        assert len(rows) == 3
        rows.sort(key=lambda r: r["cutoff"])
        prev = 0.0
        for r in rows:
            assert 0.0 <= r["coverage"] <= 1.0
            assert r["coverage"] >= prev
            assert r["covered_occurrences"] <= r["total_occurrences"]
            prev = r["coverage"]


class TestTemporalHoldout:
    def test_one_test_event_per_user_and_newest(self, spark, sf_dir):
        """Every user appears once; the held-out event is that user's
        maximum (ts, event_id)."""
        rows = _run("temporal_holdout_split", spark, sf_dir).collect()
        ev = load_table(spark, sf_dir, "events")
        truth = {
            r["user_id"]: (r["mx_ts"], r["mx_id"], r["n"])
            for r in ev.groupBy("user_id")
            .agg(
                F.max(
                    F.struct(
                        F.expr("ts_ns div 1000").alias("ts_us"),
                        F.col("event_id"),
                    )
                ).alias("mx"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "user_id",
                F.col("mx.ts_us").alias("mx_ts"),
                F.col("mx.event_id").alias("mx_id"),
                "n",
            )
            .collect()
        }
        assert len(rows) == len(truth)
        for r in rows:
            mx_ts, mx_id, n = truth[r["user_id"]]
            assert r["test_ts_us"] == mx_ts
            assert r["test_event_id"] == mx_id
            assert r["n_train"] == n - 1


class TestPsiDrift:
    def test_psi_nonnegative_and_self_zero(self, spark, sf_dir):
        """PSI >= 0 always (Gibbs), and the halves are non-empty."""
        rows = _run("psi_value_drift", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["psi"] >= 0.0
            assert r["n_ref"] > 0 and r["n_cur"] > 0


class TestSingleLinkageComponents:
    def test_partition_and_edge_consistency(self, spark, sf_dir):
        """Canonical id is the component MINIMUM (never > member);
        cluster sizes sum to the node count; every similarity edge
        joins two nodes of the SAME component."""
        from oracle_vector_search_spark.operators.knn import (
            similarity_join,
        )

        rows = _run(
            "embedding_components_single_linkage", spark, sf_dir
        ).collect()
        comp = {r["vec_id"]: r["canonical_id"] for r in rows}
        sizes = {}
        for r in rows:
            assert r["canonical_id"] <= r["vec_id"]
            sizes[r["canonical_id"]] = sizes.get(r["canonical_id"], 0) + 1
        for r in rows:
            assert r["cluster_size"] == sizes[r["canonical_id"]]
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 10 == 0
        )
        assert len(rows) == emb.count()
        for e in similarity_join(emb, emb, threshold=0.3).collect():
            assert comp[e["left_id"]] == comp[e["right_id"]]


class TestDbscan:
    def test_roles_and_density_semantics(self, spark, sf_dir):
        """Core points have >= minPts neighbors; noise has cluster -1;
        border/core cluster ids are real core canonical ids; every core
        point's cluster id is <= its own id's component minimum rule."""
        from oracle_vector_search_spark.operators.knn import (
            similarity_join,
        )

        rows = _run("dbscan_embedding_clusters", spark, sf_dir).collect()
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 10 == 0
        )
        deg = {}
        for e in similarity_join(emb, emb, threshold=0.3).collect():
            deg[e["left_id"]] = deg.get(e["left_id"], 0) + 1
            deg[e["right_id"]] = deg.get(e["right_id"], 0) + 1
        core_clusters = set()
        for r in rows:
            if r["role"] == "core":
                assert deg.get(r["vec_id"], 0) >= 3
                assert r["cluster_id"] >= 0
                core_clusters.add(r["cluster_id"])
            elif r["role"] == "noise":
                assert r["cluster_id"] == -1
        for r in rows:
            if r["role"] == "border":
                assert deg.get(r["vec_id"], 0) < 3
                assert r["cluster_id"] in core_clusters


class TestHits:
    def test_l1_normalized_and_nonnegative(self, spark, sf_dir):
        """Hub and authority vectors are L1-normalized (sum 1 within
        rounding) and non-negative."""
        rows = _run("hits_event_transitions", spark, sf_dir).collect()
        assert rows
        hs = sum(r["hub"] for r in rows)
        as_ = sum(r["authority"] for r in rows)
        assert abs(hs - 1.0) < 1e-4
        assert abs(as_ - 1.0) < 1e-4
        for r in rows:
            assert r["hub"] >= 0.0 and r["authority"] >= 0.0


class TestSprt:
    def test_decision_consistent_with_walk(self, spark, sf_dir):
        """One row; a decision implies the reported LLR actually sits
        on or past that boundary, 'continue' implies it never left the
        band; n_obs bounded by the stream length."""
        import math

        rows = _run("sprt_ab_sequential_test", spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        bound = math.log(19.0)
        assert 1 <= r["n_obs_at_decision"] <= r["n_total"]
        if r["decision"] == "accept_h1":
            assert r["llr_at_decision"] >= bound - 1e-6
        elif r["decision"] == "accept_h0":
            assert r["llr_at_decision"] <= -bound + 1e-6
        else:
            assert abs(r["llr_at_decision"]) < bound
            assert r["n_obs_at_decision"] == r["n_total"]


class TestReadability:
    def test_bounds_and_heuristics(self, spark, sf_dir):
        """Syllables >= words (floor one per word); sentences >= 1;
        every document with words is scored."""
        rows = _run("doc_readability_scores", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["n_syllables"] >= r["n_words"]
            assert r["n_sentences"] >= 1
            assert r["n_words"] >= 1


class TestIntervalOverlap:
    def test_expansion_equals_inequality_join(self, spark, sf_dir):
        """Every emitted pair satisfies the overlap predicate, and a
        brute-force inequality join finds exactly the same pairs."""
        rows = _run("session_hot_hour_overlap", spark, sf_dir).collect()
        assert rows
        H = 3_600_000_000
        hot = {}
        sess = set()
        for r in rows:
            assert r["session_start_us"] < r["hot_hour_us"] + H
            assert r["session_end_us"] >= r["hot_hour_us"]
            hot[r["hot_hour_us"]] = r["hour_events"]
            sess.add(
                (
                    r["user_id"],
                    r["session_id"],
                    r["session_start_us"],
                    r["session_end_us"],
                )
            )
        # top-20 hot hours only
        assert len(hot) <= 20
        # brute force over the emitted sessions and hours: no pair
        # satisfying the predicate is missing
        got = {
            (r["user_id"], r["session_id"], r["hot_hour_us"])
            for r in rows
        }
        for (u, sid, s_us, e_us) in sess:
            for h in hot:
                if s_us < h + H and e_us >= h:
                    assert (u, sid, h) in got


class TestKCore:
    def test_unroll_is_fixpoint_and_degree_invariant(self, spark, sf_dir):
        """One more peel round changes nothing (the unroll IS the
        fixpoint at this fixture), and every core member has >= k
        neighbors INSIDE the core."""
        from oracle_vector_search_spark.operators.knn import (
            similarity_join,
        )

        rows = _run("kcore_embedding_graph", spark, sf_dir).collect()
        core = {r["vec_id"] for r in rows if r["in_core"]}
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 10 == 0
        )
        edges = [
            (e["left_id"], e["right_id"])
            for e in similarity_join(
                emb, emb, threshold=0.25
            ).collect()
        ]
        # one extra peel round on the returned core
        deg = {}
        for a, b in edges:
            if a in core and b in core:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        for n in core:
            assert deg.get(n, 0) >= 2, f"core node {n} under-degree"


class TestGraphMetrics:
    def test_assortativity_in_range(self, spark, sf_dir):
        rows = _run("graph_degree_assortativity", spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        assert -1.0 <= r["assortativity"] <= 1.0
        assert r["n_directed_edges"] > 0
        assert r["n_directed_edges"] % 2 == 0  # both directions present

    def test_lcc_bounds_and_triangle_consistency(self, spark, sf_dir):
        """0 <= lcc <= 1 and triangles <= C(degree, 2)."""
        rows = _run(
            "local_clustering_coefficients", spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["lcc"] <= 1.0
            assert (
                r["triangles"] <= r["degree"] * (r["degree"] - 1) // 2
            )


class TestItemCf:
    def test_symmetric_scores_and_rank(self, spark, sf_dir):
        """cosine in (0,1]; rank contiguous per item; the score for
        (a,b) equals the score for (b,a) when both directions survive
        the top-k cut."""
        rows = _run("item_cf_similar_parts_top3", spark, sf_dir).collect()
        assert rows
        by_pair = {}
        by_part = {}
        for r in rows:
            assert 0.0 < r["cosine"] <= 1.0
            by_pair[(r["part"], r["similar_part"])] = r["cosine"]
            by_part.setdefault(r["part"], []).append(r["rank"])
        for p, ranks in by_part.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
        for (a, b), c in by_pair.items():
            if (b, a) in by_pair:
                assert by_pair[(b, a)] == c


class TestKaplanMeier:
    def test_survival_monotone_nonincreasing(self, spark, sf_dir):
        rows = _run(
            "kaplan_meier_user_survival", spark, sf_dir
        ).collect()
        assert rows
        rows.sort(key=lambda r: r["t_hours"])
        prev = 1.0
        prev_n = None
        for r in rows:
            assert 0.0 <= r["survival"] <= prev + 1e-9
            assert 1 <= r["n_churned"] <= r["n_at_risk"]
            if prev_n is not None:
                assert r["n_at_risk"] <= prev_n
            prev, prev_n = r["survival"], r["n_at_risk"]


class TestAlsStep:
    def test_closed_form_least_squares(self, spark, sf_dir):
        """factor = 2^20 * sum_rq / sum_qq exactly, and the moments are
        positive for every user with ratings."""
        rows = _run("als_rank1_user_step", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["n_items"] >= 1
            assert r["sum_rq"] > 0 and r["sum_qq"] > 0
            expect = round((1 << 20) * r["sum_rq"] / r["sum_qq"], 6)
            assert abs(r["user_factor"] - expect) < 1e-9


class TestConformal:
    def test_coverage_near_nominal(self, spark, sf_dir):
        """Exchangeable folds → coverage >= 1 - alpha in expectation;
        allow slack for fold noise at fixture size, and check the
        radius is a real calibration residual."""
        rows = _run("split_conformal_intervals", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["q_cents"] >= 0
            assert 0 < r["n_test"]
            assert 0 < r["n_cal"]
            assert r["coverage"] >= 0.75  # nominal 0.90 minus fold noise


class TestDid:
    def test_identity_and_totals(self, spark, sf_dir):
        """DiD equals (t1-t0)-(c1-c0) from the reported means (within
        rounding), and the four cells cover the full event count."""
        rows = _run("did_estimator", spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        recomputed = round(
            (r["treat_post_mean"] - r["treat_pre_mean"])
            - (r["control_post_mean"] - r["control_pre_mean"]),
            6,
        )
        assert abs(r["did_cents"] - recomputed) < 2e-6
        ev = load_table(spark, sf_dir, "events")
        assert r["n_total"] == ev.count()


class TestMannWhitney:
    def test_u_bounds(self, spark, sf_dir):
        """0 <= U_A <= n_a*n_b, and the arms partition the corpus."""
        rows = _run("mann_whitney_u_test", spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        assert 0.0 <= r["u_a"] <= r["n_a"] * r["n_b"]
        ev = load_table(spark, sf_dir, "events")
        assert r["n_a"] + r["n_b"] == ev.count()


class TestSpearman:
    def test_rho_in_range(self, spark, sf_dir):
        rows = _run("spearman_value_time_corr", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert -1.0 <= r["spearman_rho"] <= 1.0
            assert r["n"] >= 2


class TestKCenter:
    def test_radius_non_increasing_and_seeds_distinct(self, spark, sf_dir):
        rows = _run("kcenter_coreset_seeds", spark, sf_dir).collect()
        assert len(rows) == 5
        rows.sort(key=lambda r: r["sel_round"])
        assert rows[0]["min_dist_at_selection"] == 0.0
        seeds = [r["vec_id"] for r in rows]
        assert len(set(seeds)) == 5
        radii = [r["min_dist_at_selection"] for r in rows[1:]]
        assert all(
            radii[i] >= radii[i + 1] - 1e-9
            for i in range(len(radii) - 1)
        )


class TestBinaryQuantization:
    def test_recall_bounds_and_code_width(self, spark, sf_dir):
        rows = _run("binary_quantization_recall", spark, sf_dir).collect()
        assert len(rows) == 10
        for r in rows:
            assert 0 <= r["n_overlap"] <= 5
            assert abs(r["recall"] - r["n_overlap"] / 5.0) < 1e-9
        # self always hams to 0 -> at least the self hit overlaps
        assert all(r["n_overlap"] >= 1 for r in rows)


class TestZipf:
    def test_slope_negative(self, spark, sf_dir):
        rows = _run("zipf_slope_fit", spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_types"] > 1
        assert r["zipf_slope"] < 0.0  # frequency falls with rank


class TestStreamingPsi:
    def test_psi_nonneg_and_counts(self, spark, sf_dir):
        rows = _run(
            "streaming_psi_drift_monitor", spark, sf_dir
        ).collect()
        assert rows
        total = sum(r["n_events"] for r in rows)
        ev = load_table(spark, sf_dir, "events")
        assert total == ev.count()
        for r in rows:
            assert r["psi"] >= 0.0


class TestAssociationRules:
    def test_rule_identities(self, spark, sf_dir):
        """confidence <= 1; support <= confidence; lift symmetric in
        (a,b) when both directions emitted."""
        rows = _run("association_rules_pairs", spark, sf_dir).collect()
        assert rows
        lifts = {}
        for r in rows:
            assert 0.0 < r["confidence"] <= 1.0
            assert r["support"] <= r["confidence"] + 1e-9
            lifts[(r["ante"], r["cons"])] = r["lift"]
        for (a, b), v in lifts.items():
            if (b, a) in lifts:
                assert abs(lifts[(b, a)] - v) < 1e-9


class TestLangConfusion:
    def test_totals_match_corpus(self, spark, sf_dir):
        rows = _run("lang_id_confusion_matrix", spark, sf_dir).collect()
        doc = load_table(spark, sf_dir, "documents")
        assert sum(r["n"] for r in rows) == doc.count()
        langs = {"en", "de", "fr", "es"}
        for r in rows:
            assert r["predicted"] in langs


class TestGraphEdgeMerge:
    def test_merge_equals_rebuild(self, spark, sf_dir):
        """The merged edge table equals a direct full rebuild."""
        from oracle_vector_search_spark.queries.graph_queries import (
            _graph_tables,
        )

        merged = {
            (r["src"], r["dst"]): r["w"]
            for r in _run(
                "graph_edges_incremental_merge", spark, sf_dir
            ).collect()
        }
        edges, _ = _graph_tables(spark, sf_dir)
        rebuilt = {
            (r["src"], r["dst"]): r["w"] for r in edges.collect()
        }
        assert merged == rebuilt


class TestRocchio:
    def test_counts_in_range(self, spark, sf_dir):
        rows = _run("prf_rocchio_requery", spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            assert 0 <= r["n_same_before"] <= 6
            assert 0 <= r["n_same_after"] <= 6


class TestGreedyWalk:
    def test_walk_lands_on_graph_nodes(self, spark, sf_dir):
        rows = _run(
            "graph_ann_greedy_walk_recall", spark, sf_dir
        ).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["walk_end_id"] % 2 == 0  # a graph node
            assert r["exact_top1_id"] % 2 == 0
            assert r["hit"] == int(
                r["walk_end_id"] == r["exact_top1_id"]
            )


class TestQqDeciles:
    def test_monotone_deciles(self, spark, sf_dir):
        rows = _run("qq_deciles_by_arm", spark, sf_dir).collect()
        assert len(rows) == 9
        rows.sort(key=lambda r: r["decile"])
        for i in range(1, 9):
            assert rows[i]["arm0_cents"] >= rows[i - 1]["arm0_cents"]
            assert rows[i]["arm1_cents"] >= rows[i - 1]["arm1_cents"]
        for r in rows:
            assert (
                r["diff_cents"] == r["arm0_cents"] - r["arm1_cents"]
            )


class TestTwoPassMedian:
    def test_matches_naive_median(self, spark, sf_dir):
        rows = _run("two_pass_exact_median", spark, sf_dir).collect()
        ev = (
            load_table(spark, sf_dir, "events")
            .select(
                "event_type",
                F.floor(F.col("value") * 100)
                .cast("long")
                .alias("c"),
            )
            .collect()
        )
        by_type = {}
        for r in ev:
            by_type.setdefault(r["event_type"], []).append(r["c"])
        assert len(rows) == len(by_type)
        for r in rows:
            vals = sorted(by_type[r["event_type"]])
            assert r["n"] == len(vals)
            assert r["median_cents"] == vals[(len(vals) + 1) // 2 - 1]


class TestJoinSizeEstimate:
    def test_estimate_is_exact(self, spark, sf_dir):
        rows = _run("join_size_estimate_audit", spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["estimate_exact"] is True
        assert r["predicted_rows"] == r["actual_rows"]


class TestPowerAnalysis:
    def test_mde_positive_and_d_bounded(self, spark, sf_dir):
        rows = _run("ab_power_analysis", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["mde_cents"] > 0
            assert abs(r["cohens_d"]) < 2.0  # parity arms ~ no effect


class TestSoftDedupWeights:
    def test_cluster_mass_is_one(self, spark, sf_dir):
        """Each cluster's summed weight is ~1 and sizes are
        consistent."""
        rows = _run("dedup_soft_sample_weights", spark, sf_dir).collect()
        assert rows
        mass = {}
        size = {}
        for r in rows:
            mass[r["canonical_id"]] = (
                mass.get(r["canonical_id"], 0.0) + r["sample_weight"]
            )
            size[r["canonical_id"]] = size.get(r["canonical_id"], 0) + 1
        for cid, m in mass.items():
            assert abs(m - 1.0) < 1e-4
        for r in rows:
            assert r["cluster_size"] == size[r["canonical_id"]]


class TestFano:
    def test_positive_and_hourly_totals(self, spark, sf_dir):
        rows = _run("events_burstiness_fano", spark, sf_dir).collect()
        assert rows
        ev = load_table(spark, sf_dir, "events")
        assert sum(r["n_events"] for r in rows) == ev.count()
        for r in rows:
            assert r["fano_factor"] >= 0.0
            assert r["n_hours"] >= 2
