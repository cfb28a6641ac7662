"""Bloom-filter runtime pre-filtering — cut the big side BEFORE it
shuffles.

The join-side analogue of predicate pushdown: build a Bloom filter
over the small side's join keys (a few KB of bitmask, built with one
tiny aggregate), broadcast it as a literal array, and drop the fact
rows whose keys cannot match while they are still in the scan stage.
The shuffle then moves only plausible matches; the real join removes
the Bloom's false positives, so the result is EXACT — which is what
lets the plain-join oracle hash-check the operator.

This is the manual, inspectable version of Spark's own
`spark.sql.optimizer.runtime.bloomFilter` rewrite (which needs
cost-model thresholds the toy fixture never crosses). No false
negatives by construction: every inserted key sets the same k bits
the probe expression tests.

Sizing: m_bits=2^16 / k=3 holds ~4k keys at <1% false-positive rate;
at 100 TB scale m to ~10 bits per distinct small-side key. The
bitmask (m/8 bytes) is collected to the driver — bounded by m, never
by data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SEED_STEP = 0x9E3779B9  # golden-ratio odd step decorrelates the k hashes


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # Seed via xxhash64's multi-arg form, NOT numeric addition: `key +
    # lit(seed)` would implicit-cast a string key to NULL and collapse
    # every key to the same k positions (filter passes everything —
    # still exact, but zero selectivity). Multi-arg hashing works for
    # any key type; build and probe share this exact expression, so the
    # no-false-negative property is preserved.
    return [
        F.pmod(
            F.xxhash64(key, F.lit(i * _SEED_STEP)), F.lit(m_bits)
        )
        for i in range(k)
    ]


def build_bloom(
    df: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 3
) -> list[int]:
    """Aggregate the small side's keys into an m-bit Bloom bitmask,
    returned as ``m_bits // 64`` int64 words (driver-side, bounded by
    m — 8 KiB at the default — not by row count)."""
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("p")
    )
    rows = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.pmod(F.col("p"), F.lit(64)).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(
            # shiftleft()'s python wrapper only takes a literal shift;
            # call_function reaches the Column-arg JVM overload
            F.bit_or(
                F.call_function("shiftleft", F.lit(1).cast("long"), F.col("b"))
            ).alias("mask")
        )
        .collect()
    )  # bounded: <= m_bits/64 words (8 KiB default), never row count
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["mask"]
    return words


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int = 1 << 16, k: int = 3
) -> Column:
    """Pure column predicate: True unless the key is definitely absent.
    Evaluates in the scan stage (whole-stage codegen; the bitmask is a
    folded literal array), so rejected rows never reach the shuffle."""
    arr = F.array(*[F.lit(w) for w in words])
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        w = (p / 64).cast("long")
        b = F.pmod(p, F.lit(64)).cast("int")
        bit = F.element_at(arr, (w + 1).cast("int")).bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"), b)
        )
        cond = cond & (bit != 0)
    return cond
