"""Incremental index maintenance (operators/index_maint.py).

The contract has two halves, each pinned here:
1. *Semantics*: merge_index_rows over (old table, batch rows) is
   row-identical to a full rebuild over the upserted corpus (the DuckDB
   oracles for index_upsert_merge / ivf_index_upsert check the same
   equality end-to-end through the at-rest write path).
2. *Locality*: incremental_overwrite rewrites ONLY partitions that
   gained or lost a row — files in untouched partition directories are
   byte-for-byte the ones the base build wrote.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oracle_vector_search_spark.operators import ann, index_maint

DIMS = 64


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _tiny_batch(emb):
    """Two vectors: one brand-new id, one update (negated embedding)."""
    new_id = emb.filter(F.col("vec_id") == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    upd = emb.filter(F.col("vec_id") == 1).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: -x
        ).alias("embedding"),
    )
    return new_id.unionByName(upd)


def test_merge_equals_full_rebuild(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") != 0)
    batch = _tiny_batch(emb)

    old = ann.lsh_bucket_table(base, dims=DIMS)
    fresh = ann.lsh_bucket_table(batch, dims=DIMS)
    merged = index_maint.merge_index_rows(old, fresh)

    upserted = emb.filter(~F.col("vec_id").isin(0, 1)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(batch)
    rebuilt = ann.lsh_bucket_table(upserted, dims=DIMS)

    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, rebuilt.collect()))
    assert got == want


def test_incremental_overwrite_touches_only_affected_partitions(
    spark, sf_dir, tmp_path
):
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "lsh_idx")
    (
        ann.lsh_bucket_table(base, dims=DIMS)
        .repartition("band", "bucket")
        .write.partitionBy("band", "bucket")
        .parquet(path)
    )

    def part_files():
        out = {}
        for band_dir in os.listdir(path):
            if not band_dir.startswith("band="):
                continue
            for bucket_dir in os.listdir(os.path.join(path, band_dir)):
                d = os.path.join(path, band_dir, bucket_dir)
                files = {
                    f: os.path.getmtime(os.path.join(d, f))
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                }
                out[(band_dir, bucket_dir)] = files
        return out

    before = part_files()

    old = spark.read.parquet(path)
    fresh = ann.lsh_bucket_table(
        _tiny_batch(emb), dims=DIMS
    ).localCheckpoint()
    affected = index_maint.affected_partitions(
        old, fresh, ["band", "bucket"]
    )
    n_affected = affected.count()
    merged = index_maint.merge_index_rows(old, fresh)
    index_maint.incremental_overwrite(
        spark, merged, affected, path, ["band", "bucket"]
    )

    after = part_files()
    total = len(after)
    # a 2-vector batch touches at most 2 ids × 4 bands × (old+new bucket)
    assert n_affected <= 16 < total
    changed = {
        k for k in before
        if k in after and before[k] != after[k]
    } | (set(before) ^ set(after))
    assert len(changed) <= n_affected
    untouched = set(before) - changed
    assert untouched, "expected some partitions to survive untouched"
    for k in untouched:
        assert before[k] == after[k]  # same files, same mtimes

    # and the table still equals the full rebuild
    upserted = emb.filter(~F.col("vec_id").isin(0, 1)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(_tiny_batch(emb))
    want = sorted(
        map(tuple, ann.lsh_bucket_table(upserted, dims=DIMS).collect())
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(path)
            .select(
                "vec_id",
                F.col("band").cast("int"),
                F.col("bucket").cast("int"),
            )
            .collect(),
        )
    )
    assert got == want


def test_ivf_frozen_seeds_batch_assign_composes(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    seeds = emb.select(
        F.col("vec_id").alias("seed_id"),
        F.col("embedding").cast("array<double>").alias("sv"),
    ).filter(F.col("seed_id") % ann.SEED_STRIDE == 0)
    base = emb.filter(F.col("vec_id") != 0)
    batch = _tiny_batch(emb)

    old = ann.ivf_assign(base, seeds=seeds)
    fresh = ann.ivf_assign(batch, seeds=seeds)
    merged = index_maint.merge_index_rows(old, fresh)

    upserted = emb.filter(~F.col("vec_id").isin(0, 1)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(batch)
    rebuilt = ann.ivf_assign(upserted, seeds=seeds)

    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
