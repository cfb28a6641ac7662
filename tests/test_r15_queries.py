"""Unit tests for the round-15 query family: A-ES weighted reservoir
sampling, the two-tier fusion rerank serving plan, and the cross-
snapshot index rebuild manifest.

The oracle gate proves Spark == DuckDB; these tests prove both equal
the MATH — the A-ES selection is replicated in pure Python from the
md5 definition, and the rebuild manifest's global deltas are derived
independently from the fixture parquet.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _hash28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _aes_key(doc_id: int, w: int) -> float:
    """u^(12/w) with the SAME association order as _AES_KEY_CASE."""
    u = (_hash28(f"aes:{doc_id}") + 1) / 268435456.0
    e3 = (u * u) * u
    if w == 1:
        return (e3 * e3) * (e3 * e3)
    if w == 2:
        return e3 * e3
    if w == 3:
        return e3 * u
    return e3


def test_aes_reservoir_matches_pure_python(spark):
    """Independent replication: the per-source top-8 by u^(12/w) from
    hashlib md5 + python floats must equal Spark's selection exactly
    (both implement the same IEEE product chain)."""
    from oracle_vector_search_spark.queries.curation_queries import (
        _AES_K,
        _AES_W_DIV,
        weighted_reservoir_sample_aes,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "source", "n_chars"]
    ]
    docs = docs[docs.n_chars > 0].copy()
    docs["w"] = 1 + docs.n_chars.floordiv(_AES_W_DIV).clip(upper=3)
    docs["key"] = [
        _aes_key(int(d), int(w)) for d, w in zip(docs.doc_id, docs.w)
    ]
    expected = {}
    for src, grp in docs.groupby("source"):
        top = grp.sort_values(
            ["key", "doc_id"], ascending=[False, True]
        ).head(_AES_K)
        expected[src] = list(top.doc_id)

    got = {}
    for r in weighted_reservoir_sample_aes(spark, SF_SMOKE).collect():
        got.setdefault(r["source"], []).append((r["rnk"], r["doc_id"]))
    got = {s: [d for _, d in sorted(v)] for s, v in got.items()}
    assert got == expected


def test_aes_all_weight_tiers_live(spark):
    from oracle_vector_search_spark.queries.curation_queries import (
        weighted_reservoir_sample_aes,
    )

    out = weighted_reservoir_sample_aes(spark, SF_SMOKE)
    tiers = {r["w"] for r in out.select("w").distinct().collect()}
    # the fixture populates every tier; the sample should draw from
    # several of them (heavier tiers dominate by design)
    assert tiers <= {1, 2, 3, 4} and len(tiers) >= 2


def test_streaming_reservoir_equals_batch(spark):
    """The drained streaming reservoir must equal the batch A-ES
    selection row-for-row (batching-independence of the per-stratum
    top-k merge) — and its state is bounded by |sources|·k."""
    from oracle_vector_search_spark.queries.curation_queries import (
        _AES_K,
        weighted_reservoir_sample_aes,
    )
    from oracle_vector_search_spark.queries.streaming_queries import (
        streaming_weighted_reservoir,
    )

    batch = {
        tuple(r)
        for r in weighted_reservoir_sample_aes(spark, SF_SMOKE).collect()
    }
    stream = {
        tuple(r)
        for r in streaming_weighted_reservoir(spark, SF_SMOKE).collect()
    }
    assert stream == batch
    n_sources = len({t[1] for t in stream})
    assert len(stream) <= n_sources * _AES_K


def test_fusion_rerank_invariants(spark):
    """Structural invariants of the serving plan: contiguous ranks,
    descending scores, provenance from at least one tier, and the
    self-match at rank 1 (a query is always in its own cluster and
    bucket, and cos(q, q) = 1)."""
    from oracle_vector_search_spark.queries.ann_queries import (
        ann_fusion_rerank_topk,
    )

    rows = ann_fusion_rerank_topk(spark, SF_SMOKE).collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append(r)
    assert set(per) == set(range(10))
    for qid, rs in per.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert r["from_ivf"] + r["from_lsh"] >= 1
        # self-match: candidate via both tiers, exact score 1.0
        assert rs[0]["neighbor_id"] == qid
        assert rs[0]["score"] == 1.0
        assert rs[0]["in_exact_top5"]


def test_merkle_sync_exact_and_pruned(spark):
    """At sf0.001 both planted deltas (mutation at event_id 5, deletion
    at event_id 3) land in leaf 0, so the manifest is exactly one row —
    and the super level must actually certify clean ranges (flagged
    supers a strict subset once the id space spans several supers)."""
    from oracle_vector_search_spark.queries.audit_queries import (
        merkle_range_sync_plan,
    )

    rows = [tuple(r) for r in merkle_range_sync_plan(spark, SF_SMOKE).collect()]
    assert rows == [(0, 0, 250, 249)]


def test_snapshot_rebuild_plan_global_deltas(spark):
    """The flagged-cluster manifest must account for the planted delta
    exactly: summed n_new - n_old equals additions minus deletions
    (unflagged clusters contribute zero by definition), and entering
    minus leaving agrees row-for-row."""
    from oracle_vector_search_spark.queries.ann_queries import (
        snapshot_index_rebuild_plan,
    )

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    ids = emb.vec_id.astype(int)
    n_del = int((ids % 101 == 5).sum())
    n_add = int((ids % 103 == 7).sum())
    n_mod_surviving = int(((ids % 89 == 2) & (ids % 101 != 5)).sum())
    assert n_del and n_add and n_mod_surviving  # delta is live

    rows = snapshot_index_rebuild_plan(spark, SF_SMOKE).collect()
    assert rows
    d_count = sum(r["n_new"] - r["n_old"] for r in rows)
    d_flow = sum(r["n_entering"] - r["n_leaving"] for r in rows)
    assert d_count == n_add - n_del
    assert d_count == d_flow
    # every entering/leaving row belongs to a flagged cluster, and a
    # flagged cluster has SOME row-level churn or a pure count change
    for r in rows:
        assert r["n_entering"] > 0 or r["n_leaving"] > 0
    # churn is bounded below by the planted delta: each surviving
    # modification enters its (possibly new) cluster, each addition
    # enters, each deletion leaves
    assert sum(r["n_entering"] for r in rows) >= n_add
    assert sum(r["n_leaving"] for r in rows) >= n_del
