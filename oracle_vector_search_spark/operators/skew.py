"""Skew-aware join (SURVEY.md scale notes).

At 100 TB a single hot key (one viral document, one mega-customer)
turns a shuffle join into one straggler task. AQE's skew-join split
(enabled in session.py) handles most cases at runtime; this operator is
the explicit fallback when the skew is known ahead of time or AQE is
unavailable (e.g. inside a streaming foreachBatch):

    left  rows get a random-but-deterministic salt in [0, S)
    right rows are replicated S times (one per salt value)
    join on (key, salt) — the hot key's rows spread across S tasks

Deterministic salt (hash of the whole left row id) keeps the operator
reproducible; the result is EXACTLY the plain join's result, which is
how the test and the oracle check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` with the left side salted.

    ``salt_on``: column whose hash picks the salt (defaults to the key
    itself combined with a per-row disambiguator if present). The right
    side is exploded ×salt_buckets — keep it the smaller input.
    """
    salt_src = F.col(salt_on) if salt_on else F.spark_partition_id()
    # deterministic per-row salt: hash a stable column, never rand()
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(salt_src.cast("string")), F.lit(salt_buckets)),
    )
    r = right.withColumn(
        "__salt",
        F.explode(
            F.array(*[F.lit(i).cast("bigint") for i in range(salt_buckets)])
        ),
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
