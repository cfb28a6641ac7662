"""Scale evidence for the A-ES weighted reservoir kernel
(``aes_keyed_docs`` + the per-stratum top-k window): exact selection on
a synthetic corpus derived entirely from ``spark.range`` arithmetic
(rand()-free, partitioning-independent).

The probe proves two things at width:

* the selection is EXACT — one stratum's top-8 is recomputed in pure
  Python from the md5 definition (hashlib + the same fixed-association
  IEEE product chain) and must match id-for-id;
* the plan stays the scale shape — one scan projection plus ONE
  per-stratum window; WindowGroupLimit prunes below the shuffle, so
  the shuffle carries candidate rows only, never the corpus.

Always-on tier: 200k docs × 50 strata. A 2M tier runs under
OVS_SCALE_STRESS=1 (the standard probe switch); wall numbers feed
PERF.md.
"""

from __future__ import annotations

import hashlib
import os
import time

import pytest
from pyspark.sql import Window, functions as F

from oracle_vector_search_spark.queries.curation_queries import (
    _AES_K,
    _AES_W_DIV,
    aes_keyed_docs,
)

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"

N_STRATA = 50


def _synth_docs(spark, n):
    """doc i: source s{i%50}, n_chars 48 + i%500 (all four weight
    tiers live, same floor as the parquet fixture)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % N_STRATA)).alias("source"),
        (F.lit(48) + F.col("id") % 500).alias("n_chars"),
    )


def _py_key(doc_id: int, n_chars: int) -> tuple[int, float]:
    w = 1 + min(3, n_chars // _AES_W_DIV)
    h = int(
        hashlib.md5(f"aes:{doc_id}".encode()).hexdigest()[:7], 16
    )
    u = (h + 1) / 268435456.0
    e3 = (u * u) * u
    key = {1: (e3 * e3) * (e3 * e3), 2: e3 * e3, 3: e3 * u, 4: e3}[w]
    return w, key


def _check(spark, n):
    t0 = time.time()
    win = Window.partitionBy("source").orderBy(
        F.desc("aes_key"), F.asc("doc_id")
    )
    out = (
        aes_keyed_docs(_synth_docs(spark, n))
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= _AES_K)
        .collect()
    )
    wall = time.time() - t0
    assert len(out) == N_STRATA * _AES_K
    # exact spot check: stratum s7 recomputed from the definition
    probe = sorted(
        (
            (-key, doc_id)
            for doc_id in range(7, n, N_STRATA)
            for _, key in [_py_key(doc_id, 48 + doc_id % 500)]
        )
    )[:_AES_K]
    expected_ids = [doc_id for _, doc_id in probe]
    got_ids = [
        r["doc_id"]
        for r in sorted(
            (r for r in out if r["source"] == "s7"),
            key=lambda r: r["rnk"],
        )
    ]
    assert got_ids == expected_ids
    return wall


def test_aes_reservoir_exact_at_200k(spark):
    wall = _check(spark, 200_000)
    # generous ceiling: catches an accidental corpus-wide sort or a
    # window that stopped group-limiting
    assert wall < 90, f"A-ES probe took {wall:.1f}s"


@pytest.mark.skipif(not STRESS, reason="OVS_SCALE_STRESS=1 only")
def test_aes_reservoir_exact_at_2m_stress(spark):
    wall = _check(spark, 2_000_000)
    print(f"A-ES reservoir 2M wall: {wall:.1f}s")


def test_aes_window_group_limits(spark):
    """The executed plan must carry WindowGroupLimit — the per-stratum
    top-k prunes BELOW the shuffle, which is what makes the selection
    a candidate-sized shuffle instead of a corpus sort."""
    win = Window.partitionBy("source").orderBy(
        F.desc("aes_key"), F.asc("doc_id")
    )
    df = (
        aes_keyed_docs(_synth_docs(spark, 10_000))
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= _AES_K)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
