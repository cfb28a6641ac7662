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


def key_profile(
    left: DataFrame, right: DataFrame, key: str, top_n: int = 20
) -> DataFrame:
    """Metadata-sized skew profile over BOTH join sides.

    Output: ≤``top_n`` rows ``(key, n_left, n_right, t_left, k_left,
    t_right, k_right)`` — the heaviest candidate keys (ranked by the max
    of their per-side counts, key-tie-broken) with the global totals
    (rows ``t_*`` / distinct keys ``k_*`` per side) replicated onto each
    row so the table is self-contained.

    Both sides are profiled because the straggler can live on either:
    a key hot only on the right (the side ``salted_join`` replicates)
    still concentrates all its right rows into one task of a plain
    join. (ADVICE r4: the old left-only profile missed that case.)

    At rest: this is the table to WRITE once on ingest and refresh on
    upsert (the LSH-bucket-table discipline, operators/index_maint.py);
    every skew-aware join then reads ≤top_n rows instead of re-scanning
    both fact tables. ``profile_guided_salted_join(profile=...)``
    accepts it.
    """
    from oracle_vector_search_spark.operators.topk import global_topn_ranked

    lc = left.groupBy(key).agg(F.count("*").alias("n_left"))
    rc = right.groupBy(key).agg(F.count("*").alias("n_right"))
    both = lc.join(rc, key, "full_outer").select(
        key,
        F.coalesce("n_left", F.lit(0).cast("long")).alias("n_left"),
        F.coalesce("n_right", F.lit(0).cast("long")).alias("n_right"),
    )
    tot = both.agg(
        F.sum("n_left").alias("t_left"),
        F.sum((F.col("n_left") > 0).cast("long")).alias("k_left"),
        F.sum("n_right").alias("t_right"),
        F.sum((F.col("n_right") > 0).cast("long")).alias("k_right"),
    )
    top = global_topn_ranked(
        both, top_n, F.desc(F.greatest("n_left", "n_right")), F.asc(key)
    ).drop("rank")
    return top.crossJoin(F.broadcast(tot))


def hot_keys_from_profile(
    profile: DataFrame, key: str, skew_mult: float = 4.0
) -> list:
    """Extract the hot-key list from a ``key_profile`` table.

    A key is hot when its count exceeds ``skew_mult ×`` the mean
    rows-per-key on EITHER side. The comparison (``n × k`` vs
    ``skew_mult × t``) runs in double precision — long×long cross
    multiplication can overflow int64 at extreme cardinalities
    (ADVICE r4)."""
    def _side(side: str):
        return (
            F.col(f"n_{side}").cast("double")
            * F.col(f"k_{side}").cast("double")
            >= F.lit(float(skew_mult)) * F.col(f"t_{side}").cast("double")
        )

    # bounded: key_profile emits <= top_n rows by construction
    return [r[key] for r in profile.filter(_side("left") | _side("right")).collect()]


def profile_guided_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 20,
    skew_mult: float = 4.0,
    salt_buckets: int = 8,
    salt_on: str | None = None,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Differentiated skew join driven by the skew profiler's telemetry
    (the ``key_skew_profile`` query shape made actionable).

    Blanket salting (``salted_join``) replicates the ENTIRE right side
    ×salt_buckets — wasteful when only a handful of keys are hot. This
    operator profiles first, then salts only what needs it:

      1. profile: per-key counts on BOTH sides (``key_profile`` — one
         inline job, or pass ``profile=`` a previously WRITTEN profile
         table to skip the scan entirely: the at-rest fast path);
      2. detect: the ≤``top_n`` heaviest keys whose count exceeds
         ``skew_mult ×`` the per-side mean on either side — a
         metadata-sized driver list (bounded by ``top_n`` regardless of
         data scale);
      3. split: left/right each into a hot slice (broadcast hot-key
         ``isin`` — no shuffle) and a cold rest;
      4. join: hot slice via ``salted_join`` (right-hot replicates
         ×salt_buckets, but right-hot is only the hot keys' rows), cold
         slice via the plain equi-join AQE already handles;
      5. union. The output is exactly the plain join's result (inner
         semantics; NULL keys never match, so the cold path owning them
         is correct), which is how the oracle checks it.

    At 100 TB: the profile is a written table refreshed on ingest (read
    cost: ≤top_n rows); the only driver-side data is the hot-key list;
    replication cost is confined to the hot keys' right-side rows.
    """
    if profile is None:
        profile = key_profile(left, right, key, top_n=top_n)
    hot_keys = hot_keys_from_profile(profile, key, skew_mult=skew_mult)
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
