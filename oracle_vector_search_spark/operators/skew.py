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


def profile_guided_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 20,
    skew_mult: float = 4.0,
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Differentiated skew join driven by the skew profiler's telemetry
    (the ``key_skew_profile`` query shape made actionable).

    Blanket salting (``salted_join``) replicates the ENTIRE right side
    ×salt_buckets — wasteful when only a handful of keys are hot. This
    operator profiles first, then salts only what needs it:

      1. profile: per-key counts on the left (one partial-agg shuffle —
         the same shape as ``key_skew_profile``), global mean rows/key;
      2. detect: the ≤``top_n`` heaviest keys whose count exceeds
         ``skew_mult ×`` mean — a metadata-sized driver list (bounded by
         ``top_n`` regardless of data scale);
      3. split: left/right each into a hot slice (broadcast hot-key
         ``isin`` — no shuffle) and a cold rest;
      4. join: hot slice via ``salted_join`` (right-hot replicates
         ×salt_buckets, but right-hot is only the hot keys' rows), cold
         slice via the plain equi-join AQE already handles;
      5. union. The output is exactly the plain join's result (inner
         semantics; NULL keys never match, so the cold path owning them
         is correct), which is how the oracle checks it.

    At 100 TB: the profile pass reads one column and reduces to K rows;
    the only driver-side data is the ≤top_n hot-key list; replication
    cost is confined to the hot keys' right-side rows.
    """
    from oracle_vector_search_spark.operators.topk import global_topn_ranked

    # One profiling job: top-N candidate keys + global totals in the
    # same action (≤top_n+1 rows ever reach the driver).
    counts = left.groupBy(key).agg(F.count("*").alias("__n"))
    tot = counts.agg(F.sum("__n").alias("__t"), F.count("*").alias("__k"))
    hot_rows = (
        global_topn_ranked(counts, top_n, F.desc("__n"), F.asc(key))
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("__n") * F.col("__k")
            >= F.lit(skew_mult) * F.col("__t")
        )
        .collect()
    )
    hot_keys = [r[key] for r in hot_rows]
    if not hot_keys:
        return left.join(right, key, "inner")
    hot = F.col(key).isin(hot_keys)
    joined_cold = left.filter(~hot | F.col(key).isNull()).join(
        right.filter(~hot), key, "inner"
    )
    joined_hot = salted_join(
        left.filter(hot),
        right.filter(hot),
        key,
        salt_buckets=salt_buckets,
        salt_on=salt_on,
        how="inner",
    )
    return joined_cold.unionByName(joined_hot)
