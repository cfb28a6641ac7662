#!/usr/bin/env python
"""Memory-pressure probe for the exact-GEMM kNN tier (VERDICT r5 #7).

All routine bench runs fit comfortably in page cache + executor memory,
so they cannot show what happens when the 1M x 256-d scan no longer
fits the heap: does ``knn_exact_gemm``'s ``score_batches`` degrade
gracefully (Arrow batches stream through bounded memory) or hit an OOM
cliff?

Two phases, separate JVMs (a heap cap must be set at JVM start):

    python tools/spill_probe.py prepare        # writes the at-rest
                                               # 1M x 256-d index once
    python tools/spill_probe.py run 64g        # comfortable baseline
    python tools/spill_probe.py run 2g         # pressured heap
    python tools/spill_probe.py run 1g         # hard cap
    python tools/spill_probe.py run 2g 0.3     # + tiny unified region

The run phase STREAMS the index from parquet (the deployment shape:
codes/index tables live at rest; queries broadcast) — no persist, so
the measured number is scan+GEMM throughput under the given heap.
Prints one JSON line per run; PERF.md records the knee.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, Q, K = 1_000_000, 256, 1_000, 5
INDEX_PATH = os.environ.get(
    "SPILL_PROBE_INDEX", "/tmp/ovs_spill_probe_index"
)


def _session(mem: str, frac: str | None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("spill_probe")
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if frac is not None:
        b = b.config("spark.memory.fraction", frac)
    # Under very small heaps the vectorized parquet reader's per-task
    # column batch (default 4096 rows x 256 floats) is itself the OOM
    # driver; SPILL_PROBE_READER_BATCH applies the documented knob.
    rb = os.environ.get("SPILL_PROBE_READER_BATCH")
    if rb:
        b = b.config("spark.sql.parquet.columnarReaderBatchSize", rb)
    return b.getOrCreate()


def prepare() -> None:
    import numpy as np
    import pandas as pd

    spark = _session("16g", None)
    rng = np.random.RandomState(42)
    chunk = N // 16
    parts = []
    for c in range(16):
        hm = rng.randn(chunk, D).astype(np.float32)
        parts.append(
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        "vec_id": np.arange(
                            c * chunk, (c + 1) * chunk, dtype=np.int64
                        ),
                        "embedding": list(hm),
                    }
                ),
                schema="vec_id long, embedding array<float>",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(64).write.mode("overwrite").parquet(INDEX_PATH)
    print(json.dumps({"prepared": INDEX_PATH, "n": N, "dims": D}))


def run(mem: str, frac: str | None) -> None:
    import numpy as np
    import pandas as pd

    from oracle_vector_search_spark.operators.knn import knn_exact_gemm

    spark = _session(mem, frac)
    index = spark.read.parquet(INDEX_PATH)
    rng = np.random.RandomState(7)
    qm = rng.randn(Q, D).astype(np.float32)
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(Q, dtype=np.int64) + 20_000_000,
                "embedding": list(qm),
            }
        ),
        schema="vec_id long, embedding array<float>",
    )
    walls = []
    for _ in range(3):  # run 1 warms page cache; medians over 2..3
        t0 = time.time()
        n = knn_exact_gemm(index, qdf, k=K).count()
        walls.append(time.time() - t0)
        assert n == Q * K, n
    warm = sorted(walls[1:])[0]
    print(
        json.dumps(
            {
                "metric": "gemm_spill_probe_1m_256d_q1000_atrest",
                "driver_memory": mem,
                "memory_fraction": frac or "default",
                "cold_sec": round(walls[0], 1),
                "warm_sec": round(warm, 1),
                "warm_qps": round(Q / warm, 1),
                "warm_gflops": round(Q * N * D * 2 / warm / 1e9, 1),
            }
        )
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "prepare":
        prepare()
        return
    mem = sys.argv[2] if len(sys.argv) > 2 else "64g"
    frac = sys.argv[3] if len(sys.argv) > 3 else None
    run(mem, frac)


if __name__ == "__main__":
    main()
