"""Curation-family guards: plan shape + composition invariants.

Value correctness is covered by the DuckDB oracle gate
(tools/oracle_check.py / tests/test_oracle_surface.py); these tests pin
the SCALE properties the oracles can't see — where the work happens in
the plan — plus the classifier/dedup composition arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vector_search_spark.queries import queries as registry_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_classifier_is_scan_stage_only(spark, sf_dir):
    """The quality classifier must be a pure projection: no Exchange
    (shuffle) and no Python stage anywhere in the plan."""
    q = registry_queries()["quality_classifier_keep"]
    plan = _plan(q(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_perplexity_buckets_shuffle_on_lang_only(spark, sf_dir):
    """NLL is a scan projection; the only shuffle is the per-lang
    tercile window's hashpartitioning(lang)."""
    q = registry_queries()["lm_perplexity_buckets"]
    plan = _plan(q(spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(lang" in plan, plan


def test_semantic_dedup_no_cartesian(spark, sf_dir):
    """SemDeDup's pair generation must be the cluster-keyed join —
    never a cartesian / broadcast-nested-loop over the corpus."""
    q = registry_queries()["semantic_dedup_keep"]
    plan = _plan(q(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_shard_manifest_row_conservation(spark, sf_dir):
    """Every document lands in exactly one shard: manifest doc counts
    sum to the corpus size, and ids are conserved by the checksums."""
    q = registry_queries()["shard_export_manifest"]
    m = q(spark, sf_dir).agg(
        F.sum("n_docs").alias("n"), F.sum("total_bytes").alias("b")
    ).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.length("text")).alias("b"),
    ).collect()[0]
    assert m["n"] == expected["n"]
    assert m["b"] == expected["b"]


def test_curated_corpus_monotone(spark, sf_dir):
    """Composition invariant: corpus ⊇ classifier survivors ⊇ final
    canonical corpus, all strictly positive on the fixture."""
    q = registry_queries()["curated_corpus_checksum"]
    r = q(spark, sf_dir).collect()[0]
    assert r["n_docs_in"] >= r["n_classifier_kept"] >= r["n_final"] > 0
    assert r["bytes_total"] > 0


def test_dsir_selects_exact_top_fraction(spark, sf_dir):
    """The selected flag must mark exactly ceil(20% · n_docs) docs."""
    import math

    q = registry_queries()["dsir_importance_select"]
    rows = q(spark, sf_dir).collect()
    n = len(rows)
    n_sel = sum(r["selected"] for r in rows)
    assert n_sel == math.ceil(n * 20 / 100.0)


def test_epoch_capped_allocation_invariants(spark, sf_dir):
    """Waterfilling invariants: no domain exceeds its repetition cap;
    capped domains sit exactly at 2 epochs; and when any domain is
    uncapped the budget (3/2 x corpus tokens) is spent EXACTLY — the
    largest-remainder split loses nothing."""
    q = registry_queries()["epoch_capped_token_allocation"]
    rows = q(spark, sf_dir).collect()
    assert rows, "fixture should produce one row per language"
    total_tokens = sum(r["tokens_avail"] for r in rows)
    budget = 3 * total_tokens // 2
    for r in rows:
        assert r["allocated_tokens"] <= r["cap_tokens"]
        if r["capped"]:
            assert r["allocated_tokens"] == r["cap_tokens"]
            assert r["epochs_micro"] == 2_000_000
        else:
            assert r["epochs_micro"] < 2_000_000
    if any(not r["capped"] for r in rows):
        assert sum(r["allocated_tokens"] for r in rows) == budget
    # the fixture is nondegenerate: both capped and uncapped domains
    assert 0 < sum(r["capped"] for r in rows) < len(rows)
