#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §7 M8).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Headline set = one representative per operator family (scan-agg, joins,
window, top-k, temporal, JSON, sessionize, as-of, dedup exact/minhash,
text stats, vector exact kNN both tiers, LSH ANN, build pipeline).
Each query is executed with a count() action after a warmup of the
input metadata; timings are per-query wall clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "revenue_by_nation",
    "top3_orders_per_customer",
    "top_orders_global",
    "orders_with_big_lines",
    "hourly_event_windows",
    "user_sessions",
    "purchase_asof_order",
    "events_json_agg",
    "exact_dedup_groups",
    "minhash_near_dup_pairs",
    "doc_token_stats",
    "knn_exact_cosine_top5",
    "knn_exact_cosine_top5_gemm",
    "lsh_ann_topk",
    "pipeline_index_build",
    # r2 additions — the two r1 weak spots, kept under watch
    "packed_context_bins",
    "pipeline_query_topk",
    # r2 scale-tier joins + retrieval (bucketed pays its one-time table
    # write in-bench; the warm path is the deployment story, PERF.md §5)
    "bucketed_colocated_join_revenue",
    "bm25_retrieval_top10",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from oracle_vector_search_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("bench")
    qs = entry.queries()

    # warm the JVM + parquet footers with one trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
