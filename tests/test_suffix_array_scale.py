"""Scale evidence for the distributed suffix array (r9): the same
probe discipline the other heavy machinery gets — a range-derived
synthetic corpus with PLANTED exact duplicates whose top-20 repeated
substrings are computed independently in plain python, plus stress
walls for PERF.md.

Corpus layout: doc ``d`` has 24 tokens ``t<md5(seed:i) % 50>`` with
``seed = d`` except docs ≡ 1 (mod 100), which copy their
predecessor's text exactly.  Tokens are HASH-derived (a linear
formula would alias shifted/congruent sequences into huge accidental
repeats); the chance of an accidental ≥20-token match is ~n²/50²⁰ ≈ 0
even at the stress tier, while every planted pair (d, d+1)
contributes a full-length repeat at every token position (suffix of
the copy == suffix of the source) — so the global top-20 is exactly
the longest planted suffix matches, enumerable in python including
the (lcp desc, doc, tp) tie-breaks and the A/B occurrence order
(adjacent-in-SA: the lower doc_id sorts first among equal suffixes).

Always-on tier: 2,000 docs (48k suffixes).  ``OVS_SCALE_STRESS=1``
raises to 20,000 docs (480k suffixes) for the PERF wall.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

STRESS = os.environ.get("OVS_SCALE_STRESS") == "1"

_TOK = 24  # tokens per doc
_ALPHA = 50  # token alphabet size


def _text_tokens(seed: int) -> list[str]:
    import hashlib

    return [
        "t%d"
        % (
            int(
                hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:4], 16
            )
            % _ALPHA
        )
        for i in range(1, _TOK + 1)
    ]


def _docs(spark, n):
    seed = "(CASE WHEN id % 100 = 1 THEN id - 1 ELSE id END)"
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("xx").alias("lang"),
        F.lit("src").alias("source"),
        F.expr(
            f"array_join(transform(sequence(1, {_TOK}), i -> concat('t',"
            f" CAST(conv(substr(md5(concat(CAST({seed} AS STRING), ':',"
            f" CAST(i AS STRING))), 1, 4), 16, 10) % {_ALPHA}"
            " AS STRING))), ' ')"
        ).alias("text"),
    )


def _expected_top(n: int, k: int = 20):
    """The k longest repeated substrings, enumerated from the planted
    pairs: for pair (s, s+1) and every token position tp, the two
    suffixes are identical → lcp = len of the joined suffix; ordering
    and tie-breaks replicate the query's (lcp desc, doc_a, tok_a)."""
    rows = []
    for s in range(0, n - 1):
        if (s + 1) % 100 != 1:
            continue
        toks = _text_tokens(s)
        for tp in range(1, _TOK + 1):
            suf = " ".join(toks[tp - 1:])
            rows.append((len(suf), s, tp, s + 1, tp, suf[:40]))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    return [
        (i + 1, lcp, da, ta, db, tb, pre)
        for i, (lcp, da, ta, db, tb, pre) in enumerate(rows[:k])
    ]


@pytest.mark.parametrize("n", [2_000] + ([20_000] if STRESS else []))
def test_suffix_array_planted_duplicates_exact(spark, n, monkeypatch):
    import oracle_vector_search_spark.queries.dedup_queries as dq

    docs = _docs(spark, n).localCheckpoint()
    monkeypatch.setattr(
        dq, "load_table", lambda _s, _d, _t, _docs=docs: _docs
    )
    t0 = time.monotonic()
    rows = [
        tuple(r)
        for r in dq.suffix_array_repeated_substrings(
            spark, "unused"
        ).collect()
    ]
    wall = time.monotonic() - t0

    assert rows == _expected_top(n)
    print(f"\nSA-SCALE n={n} ({n * _TOK} suffixes): {wall:.1f}s")
