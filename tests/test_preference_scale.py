"""Scale evidence for the r8 preference/eval kernels (VERDICT r8 #6)
— the same probe discipline operators/sft.py got in r8
(tests/test_sft_scale.py): range-derived synthetic corpora with known
structure (rand()-free, partitioning-independent), EXACT independent
numpy replays, plan-shape assertions, and stress walls for PERF.md.

* Bradley-Terry pairing (`preference_queries.source_matches`): the
  match derivation must stay a keyed (lang, doc_id+1) self-join —
  merge-join-shaped, one row per adjacent pair, never all-pairs — and
  the (W_i, n_ij) sufficient statistics plus both MM steps must equal
  a vectorized numpy replay bit-for-bit after round-6.
* pass@k (the `pass_at_k_per_task` construction): one count-only
  task_id shuffle; the falling-factorial estimates equal a numpy
  replay with the identical left-associated expression order.
* BLEU-2 pairing (`bleu2_pair_eval`'s kernel): output is invariant
  under input repartitioning (the lang-window pairing is
  deterministic) and pair counts match the closed form.

Always-on tier: 80k docs / 1M samples.  ``OVS_SCALE_STRESS=1`` raises
to 800k docs / 10M samples; the stress walls feed PERF.md §0d.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_plan_fingerprints import fingerprint

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"

_LANG_BLOCK = 16  # consecutive ids sharing a language
_N_SRC = 5
_N_TOKVALS = 10


def _docs(spark, n):
    """n docs: lang blocks of 16, source cycling mod 5 (consecutive
    docs ALWAYS differ in source), text = tokens 'w<(id*i) % 10>' for
    i = 1..1+id%8 — so the quality score 1e6·distinct div total is
    exactly replayable in numpy."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("l"),
            ((F.col("id") / _LANG_BLOCK).cast("long") % 4).cast("string"),
        ).alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % _N_SRC).cast("string")).alias(
            "source"
        ),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 1 + CAST(id % 8 AS INT)),"
            " i -> concat('w', CAST((id * i) % 10 AS STRING))))"
        ).alias("text"),
    )


def _q_numpy(n: int) -> np.ndarray:
    """1e6 * distinct div total over the synthetic token layout."""
    ids = np.arange(n, dtype=np.int64)
    lens = 1 + (ids % 8)
    toks = np.full((n, 8), -1, dtype=np.int64)
    for i in range(1, 9):
        col = (ids * i) % _N_TOKVALS
        toks[:, i - 1] = np.where(lens >= i, col, -i - 10)  # pad unique
    s = np.sort(toks, axis=1)
    distinct_all = 1 + (np.diff(s, axis=1) != 0).sum(axis=1)
    n_pad = 8 - lens  # pads are unique negatives → each counted once
    distinct = distinct_all - n_pad
    return 1_000_000 * distinct // lens


@pytest.mark.parametrize("n", [80_000] + ([800_000] if STRESS else []))
def test_bradley_terry_suffstats_exact_at_scale(spark, n):
    from oracle_vector_search_spark.queries.preference_queries import (
        source_matches,
    )

    docs = _docs(spark, n).localCheckpoint()

    # --- plan shape: keyed self-join, no cartesian, no python
    matches = source_matches(docs)
    fp = fingerprint(matches)
    assert fp["cartesian_products"] == 0, fp
    assert fp["python_stages"] == 0, fp

    t0 = time.monotonic()
    per_side = matches.select(
        F.col("sa").alias("source"), F.col("a_wins").alias("w")
    ).unionByName(
        matches.select(
            F.col("sb").alias("source"), (1 - F.col("a_wins")).alias("w")
        )
    )
    wins = {
        r["source"]: (r["w_i"], r["n_i"])
        for r in per_side.groupBy("source")
        .agg(
            F.sum("w").cast("long").alias("w_i"),
            F.count(F.lit(1)).cast("long").alias("n_i"),
        )
        .collect()
    }
    wall = time.monotonic() - t0

    # --- independent numpy replay of the whole match derivation
    q = _q_numpy(n)
    i = np.arange(n - 1, dtype=np.int64)
    valid = (i % _LANG_BLOCK) != (_LANG_BLOCK - 1)  # same-lang pairs
    ia = i[valid]
    a_wins = q[ia] >= q[ia + 1]  # ida < idb: ties go to a
    sa, sb = ia % _N_SRC, (ia + 1) % _N_SRC
    w_np = np.bincount(sa, weights=a_wins, minlength=_N_SRC).astype(
        np.int64
    ) + np.bincount(sb, weights=~a_wins, minlength=_N_SRC).astype(np.int64)
    n_np = np.bincount(sa, minlength=_N_SRC) + np.bincount(
        sb, minlength=_N_SRC
    )

    m = n // _LANG_BLOCK
    assert int(n_np.sum()) == 2 * 15 * m  # 15 matches per 16-id block
    for s in range(_N_SRC):
        assert wins[f"src{s}"] == (int(w_np[s]), int(n_np[s])), s
    print(f"\nPREF-SCALE n={n}: BT suffstats={wall:.1f}s")


@pytest.mark.parametrize("n", [80_000] + ([800_000] if STRESS else []))
def test_bradley_terry_steps_partition_invariant(spark, n):
    """The rounded MM strengths must not depend on the physical
    partitioning of the input corpus (ADVICE r8: d2 aggregates
    doubles, so this is the executable tolerance check)."""
    # the registered query loads from sf_dir, so reproduce the
    # stats→steps tail over source_matches at two partition counts
    from oracle_vector_search_spark.queries.preference_queries import (
        source_matches,
    )

    outs = []
    for parts in (4, 32):
        docs = _docs(spark, n).repartition(parts).localCheckpoint()
        matches = source_matches(docs)
        per_side = matches.select(
            F.col("sa").alias("source"), F.col("a_wins").alias("w")
        ).unionByName(
            matches.select(
                F.col("sb").alias("source"),
                (1 - F.col("a_wins")).alias("w"),
            )
        )
        wins = (
            per_side.groupBy("source")
            .agg(
                F.sum("w").cast("long").alias("w_i"),
                F.count(F.lit(1)).cast("long").alias("n_i"),
            )
            .orderBy("source")
            .collect()
        )
        outs.append([tuple(r) for r in wins])
    assert outs[0] == outs[1]


_PK_TASKS = 1024
_PASS_K = (1, 5, 10)


@pytest.mark.parametrize(
    "n", [1_000_000] + ([10_000_000] if STRESS else [])
)
def test_pass_at_k_exact_at_scale(spark, n):
    """pass@k over n synthetic samples: ONE count-only shuffle, then
    the falling-factorial projection — numpy replays the identical
    left-associated float expression, so round-6 equality is exact."""
    from oracle_vector_search_spark.queries.sft_queries import (
        _falling_ratio_sql,
    )

    samples = spark.range(n).select(
        (F.col("id") % _PK_TASKS).alias("task_id"),
        F.when((F.col("id") * 7919) % 13 < 4, 1).otherwise(0).alias(
            "correct"
        ),
    )
    per_task = samples.groupBy("task_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("correct").cast("bigint").alias("c"),
    )
    cols = [
        F.expr(f"round(1.0 - {_falling_ratio_sql(k)}, 6)").alias(
            f"pass_at_{k}"
        )
        for k in _PASS_K
    ]
    df = per_task.select("task_id", "n", "c", *cols).orderBy("task_id")

    fp = fingerprint(df)
    assert fp["python_stages"] == 0 and fp["cartesian_products"] == 0, fp

    t0 = time.monotonic()
    rows = df.collect()
    wall = time.monotonic() - t0
    assert len(rows) == _PK_TASKS

    ids = np.arange(n, dtype=np.int64)
    corr = ((ids * 7919) % 13 < 4).astype(np.int64)
    n_np = np.bincount(ids % _PK_TASKS, minlength=_PK_TASKS)
    c_np = np.bincount(ids % _PK_TASKS, weights=corr, minlength=_PK_TASKS
                       ).astype(np.int64)
    for r in rows:
        t = r["task_id"]
        assert (r["n"], r["c"]) == (int(n_np[t]), int(c_np[t]))
        for k in _PASS_K:
            num = 1.0
            for j in range(k):
                num *= float(n_np[t] - c_np[t] - j)
            den = 1.0
            for j in range(k):
                den *= float(n_np[t] - j)
            assert r[f"pass_at_{k}"] == round(1.0 - num / den, 6), (t, k)
    print(f"\nPREF-SCALE n={n}: pass@k={wall:.1f}s")


@pytest.mark.parametrize("n", [20_000] + ([200_000] if STRESS else []))
def test_bleu2_pairing_partition_invariant(spark, n, sf_dir, monkeypatch):
    """BLEU-2's lang-window pairing is deterministic: identical output
    under different input partitionings, and the pair count matches
    the closed form (floor(per-lang docs / 2) complete pairs)."""
    import oracle_vector_search_spark.queries.sft_queries as sq

    outs = []
    for parts in (4, 32):
        docs = _docs(spark, n).repartition(parts).localCheckpoint()
        monkeypatch.setattr(
            sq, "load_table", lambda _s, _d, _t, _docs=docs: _docs
        )
        df = sq.bleu2_pair_eval.__wrapped__(spark, "unused") if hasattr(
            sq.bleu2_pair_eval, "__wrapped__"
        ) else sq.bleu2_pair_eval(spark, "unused")
        t0 = time.monotonic()
        rows = df.collect()
        wall = time.monotonic() - t0
        outs.append([tuple(r) for r in rows])
    assert outs[0] == outs[1]
    # every lang has n/4 docs → n/8 complete pairs each
    assert len(outs[0]) == 4 * (n // 4 // 2)
    print(f"\nPREF-SCALE n={n}: bleu2={wall:.1f}s pairs={len(outs[0])}")
