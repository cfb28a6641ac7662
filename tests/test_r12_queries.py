"""Round-12 query guards: plan shape + invariants for the two new
registrations (value correctness is the DuckDB oracle gate's job —
both queries carry oracle SQL and sit in the r12 driver window).
"""

from __future__ import annotations

from oracle_vector_search_spark.queries import queries as registry_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------ epoch_shuffle_shards


def test_epoch_shuffle_conserves_the_corpus_every_epoch(spark, sf_dir):
    """Each epoch is a PERMUTATION: every document lands in exactly one
    shard per epoch, so per-epoch doc counts sum to the corpus size."""
    q = registry_queries()["epoch_shuffle_shards"]
    rows = q(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    per_epoch: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["shard_id"] < 16
        per_epoch[r["epoch"]] = per_epoch.get(r["epoch"], 0) + r["n_docs"]
    assert sorted(per_epoch) == [0, 1, 2]
    assert all(n == n_docs for n in per_epoch.values()), per_epoch


def test_epoch_shuffle_is_a_fresh_permutation_per_epoch(spark, sf_dir):
    """The point of the operator: no two epochs see the same shard
    composition (keys are hash('ep:' epoch ':' doc_id), so membership,
    order witnesses and checksums all differ across epochs)."""
    q = registry_queries()["epoch_shuffle_shards"]
    rows = q(spark, sf_dir).collect()
    sig: dict[int, list] = {}
    for r in rows:
        sig.setdefault(r["epoch"], []).append(
            (r["shard_id"], r["n_docs"], r["first_doc_id"],
             r["shuffle_checksum"])
        )
    fingerprints = {e: tuple(sorted(v)) for e, v in sig.items()}
    assert len(set(fingerprints.values())) == 3, fingerprints


def test_epoch_shuffle_plan_one_shuffle_no_sort(spark, sf_dir):
    """Scale shape: epoch explode is a scan-stage Generate, the hash
    key is born in the scan projection, the ONLY shuffle is the
    (epoch, shard) group-by with map-side combine, and there is no
    global sort and no Python stage anywhere."""
    q = registry_queries()["epoch_shuffle_shards"]
    plan = _plan(q(spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert "Sort " not in plan, plan
    assert "Python" not in plan, plan
    assert "partial_bit_xor" in plan, plan
    assert "Generate" in plan, plan


# ------------------------------------------ tokenizer_fertility_by_lang


def test_fertility_invariants_and_plan(spark, sf_dir):
    """Greedy max-4-char segmentation bounds: every word costs >= 1
    piece (fertility >= 1) and every piece carries 1..4 chars. Plan:
    per-doc counts are scan-stage higher-order aggregates (no exploded
    token table), one group-by shuffle, no Python stage."""
    q = registry_queries()["tokenizer_fertility_by_lang"]
    df = q(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan, plan
    assert "Generate" not in plan, plan  # never explodes tokens
    # The >= 1 bounds below assume no empty-normalized documents: an
    # empty doc normalizes to '' which splits to [''] (1 word, 0
    # pieces, 0 chars) and can drag a group's fertility below 1. Pin
    # that fixture property explicitly so a future fixture regen that
    # plants empty docs fails HERE, not in the bound (ADVICE r12).
    from oracle_vector_search_spark.io import load_table
    from oracle_vector_search_spark.functions import text as T
    import pyspark.sql.functions as F

    n_empty = (
        load_table(spark, sf_dir, "documents")
        .where(F.length(T.norm_text("text")) == 0)
        .count()
    )
    assert n_empty == 0, f"fixture has {n_empty} empty-normalized docs"
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["total_pieces"] >= r["total_words"] > 0
        assert r["fertility"] >= 1.0
        assert 1.0 <= r["chars_per_piece"] <= 4.0


# ------------------------------------------------ split_leakage_audit


def test_split_leakage_construction_invariants(spark, sf_dir):
    """Group-hashed splitting leaks ZERO users by construction; the
    row-hashed scheme must leak on this fixture (every user has many
    events); both schemes' split sizes partition the event count."""
    q = registry_queries()["split_leakage_audit"]
    r = q(spark, sf_dir).collect()[0]
    assert r["user_hash_leaked_users"] == 0
    assert r["row_hash_leaked_users"] > 0
    for scheme in ("user_hash", "row_hash"):
        total = sum(r[f"{scheme}_{s}"] for s in ("train", "val", "test"))
        assert total == r["n_events"], (scheme, total, r["n_events"])
    assert 0.0 < r["row_hash_leaked_pct"] <= 1.0


def test_split_leakage_plan_shape(spark, sf_dir):
    """One user-keyed shuffle + one global aggregate; the 1-row frames
    cross-join via broadcast. No corpus window, explode, or Python."""
    q = registry_queries()["split_leakage_audit"]
    plan = _plan(q(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Generate" not in plan, plan
    assert "Python" not in plan, plan
    assert "Window" not in plan, plan
