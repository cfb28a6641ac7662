"""Scale evidence for the text-retrieval at-rest path (VERDICT r7 #4
— give BM25/TF-IDF postings the same 10×-docs probe the graph kernels
got): postings build cost is corpus-sized, the warm query reads only
the probed term buckets (metadata-level pruning, asserted in the
plan), and the bucket layout is invariant in corpus size.

Design mirrors tests/test_graph_scale.py: the corpus derives entirely
from ``spark.range`` arithmetic — doc ``i`` has ``10 + i % 20`` words,
word ``j`` of doc ``i`` is ``letter(h) || h`` with
``h = (i*31 + j*7) % 10000`` and ``letter(h) = chr(97 + h % 26)`` —
rand()-free, so every assertion is exact:

* stats: ``n_docs == n`` and ``avgdl == 19.5`` exactly (n is a
  multiple of 20, mean of 10..29 = 19.5);
* the probed terms' document frequencies from the AT-REST postings
  equal an independent direct-scan derivation over the raw text
  (two different plans, same exact integers);
* a probe read filters with ``PartitionFilters`` on ``tb`` — the
  100 TB property: a known-term query touches 1/16 of the index
  files no matter how large the corpus;
* the bucket directory count on disk is identical across tiers.

Always-on tier: 50k docs. 500k and 5M docs run under
``OVS_SCALE_STRESS=1`` (same switch as every other probe); the stress
walls feed PERF.md §0f.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.io import read_artifact, write_artifact
from oracle_vector_search_spark.queries.training_queries import (
    N_TERM_BUCKETS,
    build_posting_tables,
    term_bucket,
)

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"
VOCAB = 10_000
# three fixed probe terms with h = 1, 2, 3 (letters b, c, d)
PROBE_TERMS = [f"{chr(97 + h % 26)}{h}" for h in (1, 2, 3)]


def _corpus(spark, n):
    """(doc_id, text) with text = the deterministic word sequence."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.col("id") % 20 + 9).cast("int")),
                lambda j: F.concat(
                    F.substring(
                        F.lit("abcdefghijklmnopqrstuvwxyz"),
                        ((F.col("id") * 31 + j * 7) % VOCAB % 26 + 1)
                        .cast("int"),
                        1,
                    ),
                    ((F.col("id") * 31 + j * 7) % VOCAB).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )


def _direct_doc_freq(docs):
    """Independent derivation: doc_freq per probe term straight off the
    raw text column — never touches the posting table."""
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    return {
        r["term"]: r["df"]
        for r in tok.filter(F.col("term").isin(PROBE_TERMS))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    }


_BUCKET_DIRS: dict[int, int] = {}


@pytest.mark.parametrize(
    "n", [50_000] + ([500_000, 5_000_000] if STRESS else [])
)
def test_postings_at_rest_scale(spark, n, tmp_path):
    docs = _corpus(spark, n).localCheckpoint()

    t0 = time.monotonic()
    postings, stats = build_posting_tables(docs)
    p_path = str(tmp_path / "postings")
    write_artifact(
        postings.repartition("tb"), p_path, partition_by=["tb"]
    )
    build_wall = time.monotonic() - t0

    st = stats.collect()[0]
    assert st["n_docs"] == n
    assert st["avgdl"] == 19.5  # exact: mean of 10..29 over n % 20 == 0

    at_rest = read_artifact(spark, p_path)
    buckets = sorted({term_bucket(t) for t in PROBE_TERMS})

    # warm query: BM25-lite top-10 for the probe terms over the
    # at-rest table — the shape bm25_retrieval_top10 serves
    t0 = time.monotonic()
    hits = at_rest.filter(
        F.col("tb").isin(buckets) & F.col("term").isin(PROBE_TERMS)
    )
    topk = (
        hits.join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("tf")
                * F.lit(2.2)
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    query_wall = time.monotonic() - t0
    assert len(topk) == 10

    # exactness: postings-path doc_freq == direct-scan doc_freq
    pdf = {
        r["term"]: r["df"]
        for r in hits.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    }
    assert pdf == _direct_doc_freq(docs)

    # pruning: the probe read is a metadata-level partition filter
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [tb#" in plan and " IN (" in plan, plan

    # bucket layout invariance across tiers
    n_dirs = sum(
        1
        for d in os.listdir(p_path)
        if d.startswith("tb=")
    )
    assert 0 < n_dirs <= N_TERM_BUCKETS
    _BUCKET_DIRS[n] = n_dirs
    assert len(set(_BUCKET_DIRS.values())) == 1, _BUCKET_DIRS

    n_post = at_rest.count()
    print(
        f"\nRETRIEVAL-SCALE n={n}: postings={n_post} "
        f"build={build_wall:.1f}s warm_query={query_wall:.2f}s "
        f"bucket_dirs={n_dirs}"
    )
