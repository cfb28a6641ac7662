"""Document chunking + context-window packing — the sequence-prep
operators of an LLM training pipeline.

* ``chunk_documents``: split each document into fixed-size token
  windows with overlap (stride = chunk_size - overlap; the final
  chunk may be short). Pure per-row array projection — embarrassingly
  parallel, no shuffle, no UDF.
* ``pack_chunks``: assign chunks to fixed token-budget bins by running
  offset (bin = floor(cumulative_tokens_before / window)) within a
  shard. Bins never span shards, so the running-sum window is
  PARTITIONED — every shard packs independently and in parallel; no
  single-task global window exists in the plan. The offset-based rule
  is a deterministic approximation of greedy first-fit that stays
  SQL-expressible (exact greedy needs per-bin running resets — a
  sequential fold; see ``pack_chunks_greedy``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from oracle_vector_search_spark.functions import text as T


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 40,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens) — whitespace tokens,
    stride chunk_size-overlap, tail chunk kept (may be short)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    d = df.withColumn("norm", T.norm_text(text_col)).withColumn(
        "toks", F.split("norm", " ")
    )
    starts = F.expr(
        f"sequence(1, greatest(size(toks) - {overlap}, 1), {stride})"
    )
    d = d.select(
        F.col(id_col), F.col("toks"), F.posexplode(starts).alias("i", "start")
    )
    chunk = F.slice(F.col("toks"), F.col("start"), chunk_size)
    return d.select(
        F.col(id_col),
        F.col("i").cast("int").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


# bin_id = shard * SHARD_STRIDE + local_bin: globally unique, and a
# shard never produces 2^40 bins (that would be ~256 PiB of tokens in
# one shard at window=256).
SHARD_STRIDE = 1 << 40


def pack_chunks(
    chunks: DataFrame,
    window_tokens: int = 256,
    id_col: str = "doc_id",
    shard_col: str | None = None,
    num_shards: int = 32,
) -> DataFrame:
    """Assign every chunk a bin_id by cumulative token offset over the
    deterministic (doc_id, chunk_idx) order WITHIN its shard.

    ``shard_col`` names an integral shard key (source, date bucket, …);
    when None the shard is ``pmod(id_col, num_shards)`` (requires a
    numeric id). The offset window is partitioned by shard, so packing
    parallelizes across shards and no global single-task window appears
    in the plan. bin_id = shard * 2^40 + floor(offset / window) is
    globally unique and portable (the DuckDB oracle computes the same
    arithmetic)."""
    d = chunks
    drop_shard = False
    if shard_col is None:
        d = d.withColumn(
            "__shard", F.pmod(F.col(id_col).cast("long"), F.lit(num_shards))
        )
        shard_col = "__shard"
        drop_shard = True
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col, "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    bin_id = (
        F.col(shard_col).cast("long") * F.lit(SHARD_STRIDE)
        + F.floor(offset / window_tokens)
    ).cast("long")
    out = d.withColumn("bin_id", bin_id)
    return out.drop("__shard") if drop_shard else out


def pack_chunks_greedy(
    chunks: DataFrame,
    window_tokens: int = 256,
    shard_col: str | None = None,
    id_col: str = "doc_id",
    num_shards: int = 32,
) -> DataFrame:
    """EXACT greedy first-fit packing: walk chunks in deterministic
    (doc_id, chunk_idx) order, open a new bin whenever the current one
    would exceed ``window_tokens``. Guarantees no bin exceeds the budget
    (except a single oversized chunk, which gets its own bin).

    Sequential by nature → runs as an applyInPandas grouped map per
    shard. Sharding is the DEFAULT (``pmod(id_col, num_shards)``, same
    policy as ``pack_chunks``): bins never span shards, so every shard
    packs in parallel and no single task ever sees the whole corpus.
    Pass an explicit integral ``shard_col`` (source, date bucket) to
    control placement. bin_id = shard * 2^40 + local_bin is globally
    unique. Output adds (bin_id, bin_fill)."""
    import pandas as pd

    d = chunks
    drop_shard = False
    if shard_col is None:
        d = d.withColumn(
            "__shard", F.pmod(F.col(id_col).cast("long"), F.lit(num_shards))
        )
        shard_col = "__shard"
        drop_shard = True

    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in d.schema.fields
    )
    out_schema = f"{in_fields}, bin_id long, bin_fill long"
    shard_name = shard_col

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([id_col, "chunk_idx"]).reset_index(drop=True)
        base = int(pdf[shard_name].iloc[0]) * SHARD_STRIDE if len(pdf) else 0
        bins, fills = [], []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > window_tokens:
                bin_id += 1
                fill = 0
            fill += int(n)
            bins.append(base + bin_id)
            fills.append(fill)
        return pdf.assign(bin_id=bins, bin_fill=fills)

    out = d.groupBy(shard_col).applyInPandas(pack, schema=out_schema)
    return out.drop("__shard") if drop_shard else out
