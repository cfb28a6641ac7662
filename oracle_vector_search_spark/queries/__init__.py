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
    """Import every query module so registration side effects run.

    Import errors are fatal: a module that fails to import would silently
    drop its registered queries from the verified surface, so we re-raise
    rather than shrink the registry without a trace.
    """
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
        "feature_queries",
        "training_queries",
        "scale_queries",
        "audit_queries",
        "pq_queries",
        "tpch_queries",
        "tpch2_queries",
        "analytics_queries",
        "graph_queries",
        "linalg_queries",
        "pipeline_queries",
        "streaming_queries",
        "format_queries",
        "curation_queries",
        "lm_queries",
        "preference_queries",
        "sft_queries",
    ):
        __import__(f"oracle_vector_search_spark.queries.{mod}")


# Registry ordering exposed to the driver. The driver's hard correctness
# gate checks a 50-entry prefix of queries(), so the prefix ROTATES each
# round to spread verification across the whole registry:
#   r1 ∪ r2 ∪ r3 ∪ r4 ∪ r5 windows = every query that existed before
#   round 5 (186 distinct driver-checked names; CORRECTNESS_r05 was
#   50/50 green).
#   r6 window = 8 sentinels + the 42 oldest round-5 additions
#   (CORRECTNESS_r06: 49/50 green; the one red was
#   embedding_covariance_upper's −0.0-vs-+0.0 rounding artifact, fixed
#   this round — see functions/rounding.py).
#   r7 (this file) = 8 sentinels + embedding_covariance_upper (re-check
#   of the ±0.0 fix, per VERDICT r6 #1) + the 29 remaining
#   never-driver-checked r5 additions, the 11 oldest round-6 additions,
#   and the new round-7 real-pixel chain query (VERDICT r6 #4).
#   Queries past position 49 remain verified by the local gate
#   (tools/oracle_check.py, full surface, CI via
#   tests/test_oracle_surface.py). Keep this list at exactly 50 names.
#   r8 (this file) = 8 sentinels + 42 of the 49 never-driver-checked
#   names: the 2 new round-8 queries (reference_crops_clahe_chain_profile,
#   video_keyframe_knn — VERDICT r7 #3/#6), all 10 round-7 additions
#   (including l_diversity_audit, dp_noisy_counts_deterministic and
#   mutual_information_features, omitted from the earlier draft), and
#   the 30 oldest round-6-era additions in registration order. The 7
#   overflow names roll to r9 (registration-order tail:
#   local_clustering_coefficients, graph_edges_incremental_merge,
#   graph_ann_greedy_walk_recall, kcenter_coreset_seeds,
#   streaming_topk_trending, streaming_psi_drift_monitor,
#   zipf_slope_fit) — all were verified green by the r7 judge's local
#   oracle run; only the driver-side record is pending.
#   r10 (draft): with the r9 window green, every query registered
#   before r9 has a driver row and the 4 r9 additions get their first.
#   Coverage is then total, so r10 shifts to FRESHNESS rotation:
#   8 sentinels + the 42 names with the OLDEST driver-side check
#   (r1/r2-era rows first, registration order within a round), skipping
#   anything re-checked in r8/r9 — plus first-checks for any r10
#   registrations, swapped in as they land (the r9 placeholder
#   discipline).
#   r9 (this file) = 8 sentinels + ALL 26 never-driver-checked names
#   (the 7 r6-era names the r8 window rolled + the 19 round-8
#   additions — every one verified green by the r8 judge's local
#   oracle run) + 12 re-check slots spent on implementations that
#   changed in r8 or r9 (the CLAHE-chain parity query — true
#   pure-numpy CLAHE replaced the equalize stand-in; the two video
#   queries — at-rest clip corpus + GEMM-tier kNN; the r8
#   ann_recall_vs_exact_clustered fast path; the bm25/tfidf/term-doc
#   postings refactor family; the r8 bootstrap/admission/audio
#   speedups) + the 4 NEW r9 registrations (BPE ranked-merge apply,
#   distributed suffix array, unigram hard-EM prune step, WordPiece
#   merge-gain scoring). After this window every query registered
#   before r9 has a driver-side CORRECTNESS row and every r9 query
#   gets its first one.
_PRIORITY: tuple[str, ...] = (
    # --- sentinels: always driver-checked in every round ---
    "pipeline_label_parse",
    "pipeline_bbox_denorm",
    "pipeline_index_build",
    "pipeline_query_topk",
    "knn_exact_cosine_top5",
    "knn_exact_cosine_top5_gemm",
    "exact_dedup_groups",
    "streaming_upsert_snapshot",
    # --- r6-era additions rolled from the r8 window (7) ---
    "local_clustering_coefficients",
    "graph_edges_incremental_merge",
    "graph_ann_greedy_walk_recall",
    "kcenter_coreset_seeds",
    "streaming_topk_trending",
    "streaming_psi_drift_monitor",
    "zipf_slope_fit",
    # --- round-8 additions, never driver-checked (19) ---
    "preference_pairs_dpo",
    "bradley_terry_mm_step",
    "preference_agreement_kappa",
    "reward_calibration_ece",
    "best_of_n_selection_lift",
    "unigram_viterbi_tokenize_top30",
    "image_png_decode_parity",
    "streaming_preference_bt_stats",
    "domain_mixture_mw_step",
    "truncation_loss_audit",
    "qdigest_quantile_audit",
    "sft_turn_alternation_audit",
    "sft_loss_mask_accounting",
    "pass_at_k_per_task",
    "grpo_group_advantage",
    "streaming_pass_at_k_stats",
    "epoch_capped_token_allocation",
    "bleu2_pair_eval",
    "preference_length_bias_audit",
    # --- re-check slots: implementations changed in r8/r9 (16) ---
    "reference_crops_clahe_chain_profile",  # r9: true numpy CLAHE
    "video_keyframe_knn",  # r9: at-rest clip corpus
    "video_mjpeg_frame_parity",  # r9: at-rest clip corpus
    "ann_recall_vs_exact_clustered",  # r8 fast path
    "bm25_retrieval_top10",  # r8 postings refactor
    "tfidf_cosine_top5",  # r8 postings refactor
    "repeated_span_doc_stats",  # r8 postings refactor
    "phrase_retrieval_top20",  # r8 postings refactor
    "boolean_and_retrieval_top20",  # r8 postings refactor
    "bootstrap_mean_ci_deterministic",  # r8 speedup (caf472c)
    "incremental_corpus_admission",  # r8 speedup
    "audio_wav_feature_parity",  # r8 speedup
    # --- new r9 registrations (swapped in as they land) ---
    "bpe_apply_ranked_merges_top30",  # r9: BPE ranked-merge apply
    "suffix_array_repeated_substrings",  # r9: distributed SA dedup
    "unigram_em_prune_step",  # r9: unigram trainer hard-EM step
    "wordpiece_merge_gain_top20",  # r9: WordPiece trainer scoring
)


def _ordered() -> dict[str, tuple[SparkQuery, str | None]]:
    load_all_modules()
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    out = {name: REGISTRY[name] for name in _PRIORITY}
    out.update((n, v) for n, v in REGISTRY.items() if n not in out)
    return out


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _ordered().items() if sql is not None
    }
