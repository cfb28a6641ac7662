#!/usr/bin/env python
"""Interleaved A/B: old (git HEAD) vs new (working tree) query impls.

Alternates old/new run-for-run in ONE session so ambient host phases
hit both variants (the r15 methodology). Usage:
    python /tmp/ab_r16.py <sf_dir> <pairs> <query...>
"""
import os
import statistics
import subprocess
import sys
import time
import types

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

sf_dir = sys.argv[1]
pairs = int(sys.argv[2])
names = sys.argv[3:]

from oracle_vector_search_spark.session import get_spark  # noqa: E402
import oracle_vector_search_spark.queries as Q  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

spark = get_spark("ab_r16")
new_qs = entry.queries()

# map query -> module file
MOD = {
    "merkle_range_sync_plan": "oracle_vector_search_spark/queries/audit_queries.py",
    "snapshot_index_rebuild_plan": "oracle_vector_search_spark/queries/ann_queries.py",
    "bradley_terry_mm_step": "oracle_vector_search_spark/queries/preference_queries.py",
    "bleu2_pair_eval": "oracle_vector_search_spark/queries/sft_queries.py",
    "prf_rocchio_requery": "oracle_vector_search_spark/queries/vector_queries.py",
    "kmeans_refine_clusters": "oracle_vector_search_spark/queries/ann_queries.py",
    "semantic_dedup_keep": "oracle_vector_search_spark/queries/curation_queries.py",
    "curated_corpus_checksum": "oracle_vector_search_spark/queries/curation_queries.py",
    "nightly_corpus_build_manifest": "oracle_vector_search_spark/queries/curation_queries.py",
    "psi_value_drift": "oracle_vector_search_spark/queries/feature_queries.py",
    "bigram_lm_fluency": "oracle_vector_search_spark/queries/lm_queries.py",
    "pca_top_eigenvector": "oracle_vector_search_spark/queries/linalg_queries.py",
}

_old_mod_cache = {}


def load_old_fn(qname):
    path = MOD[qname]
    if path not in _old_mod_cache:
        src = subprocess.check_output(
            ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "show", os.environ.get("AB_REF", "HEAD") + ":" + path]
        ).decode()
        mod = types.ModuleType(f"old_{path.replace('/', '_')}")
        orig = Q.register
        Q.register = lambda name, sql: (lambda fn: fn)
        try:
            exec(compile(src, f"HEAD:{path}", "exec"), mod.__dict__)
        finally:
            Q.register = orig
        _old_mod_cache[path] = mod
    return getattr(_old_mod_cache[path], qname)


for qname in names:
    old_fn = load_old_fn(qname)
    new_fn = new_qs[qname]
    # one untimed warm run each (at-rest table writes, JIT, footers)
    old_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    new_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    olds, news = [], []
    for _ in range(pairs):
        t0 = time.time()
        old_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        olds.append(time.time() - t0)
        t0 = time.time()
        new_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        news.append(time.time() - t0)
    print(
        f"{qname}: old min={min(olds):.3f} med={statistics.median(olds):.3f}"
        f" | new min={min(news):.3f} med={statistics.median(news):.3f}"
        f"  ({pairs} interleaved pairs)"
    )
    sys.stdout.flush()
