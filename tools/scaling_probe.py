#!/usr/bin/env python
"""Low-core scaling probe (VERDICT r15 #6): time queries at
$SPARK_GRAFT_CPUS over a given sf_dir, bench-style (1 cold + 3 warm,
median of warm), one JSON line out."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

sf_dir = sys.argv[1]
names = sys.argv[2:]

from oracle_vector_search_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

spark = get_spark("scaling_probe")
qs = entry.queries()
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

out = {}
for name in names:
    fn = qs[name]
    runs = []
    for _ in range(4):
        t0 = time.time()
        fn(spark, sf_dir).count()
        runs.append(time.time() - t0)
    out[name] = {
        "cold": round(runs[0], 3),
        "warm_med": round(statistics.median(runs[1:]), 3),
        "warm_min": round(min(runs[1:]), 3),
    }
print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "sf_dir": sf_dir, "q": out}))
