"""Sketch-based similarity + remaining relational coverage.

The KMV (k-minimum-values) containment estimator follows the idea in
"GB-KMV: An Augmented KMV Sketch for Approximate Containment Similarity
Search" (ICDE 2019, see PAPERS.md): keep the k smallest hash values of
each set; similarity is estimated from sketch overlap. Containment
|A∩B|/|A| detects near-SUBSET relations (quotes, partial copies) that
symmetric Jaccard misses — a first-class dedup signal for training
corpora. Because the engine's hash family is portable, both the exact
containment and the sketch estimate are oracle-checked, not just
statistically validated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from oracle_vector_search_spark.functions import text as T
from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.topk import bounded_global_order
from oracle_vector_search_spark.queries import register

KMV_K = 32
CONTAINMENT_MIN = 0.5


@register(
    "kmv_containment_pairs",
    f"""
WITH base AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
), tok AS (
  SELECT doc_id, source, norm, string_split(norm, ' ') AS toks FROM base
), sh AS (
  SELECT doc_id, source, {T.duck_shingles('toks', 'norm')} AS shingles
  FROM tok
), hs AS (
  SELECT doc_id, source,
         list_sort(list_distinct({T.duck_shingle_hashes('shingles')})) AS hset
  FROM sh
), sk AS (
  SELECT doc_id, source, hset, hset[1:{KMV_K}] AS sketch FROM hs
)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       round(len(list_intersect(a.hset, b.hset)) * 1.0 / len(a.hset), 6)
         AS exact_containment,
       round(len(list_filter(
               list_sort(list_distinct(list_concat(a.sketch, b.sketch)))
                 [1:{KMV_K}],
               h -> list_contains(a.sketch, h)
                    AND list_contains(b.sketch, h))) * 1.0
             / least(len(list_distinct(list_concat(a.sketch, b.sketch))),
                     {KMV_K}), 6)
         AS kmv_jaccard_est
FROM sk a
JOIN sk b ON a.source = b.source AND a.doc_id <> b.doc_id
WHERE round(len(list_intersect(a.hset, b.hset)) * 1.0 / len(a.hset), 6)
      >= {CONTAINMENT_MIN}
""",
)
def kmv_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment |A∩B|/|A| ≥ 0.5 within source blocks (asymmetric —
    finds docs mostly contained in another) + the KMV-sketch Jaccard
    estimate computed from k=32-value sketches (the at-scale form:
    sketches are tiny per-row state; the full hash sets never ship)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.withColumn("norm", T.norm_text("text")).withColumn(
        "toks", F.split("norm", " ")
    )
    d = d.withColumn(
        "shingles", F.expr(T.word_shingles_expr("toks", "norm"))
    ).withColumn(
        "hset",
        F.array_sort(
            F.array_distinct(F.expr(T.shingle_hashes_expr("shingles")))
        ),
    )
    d = d.select(
        "doc_id",
        "source",
        "hset",
        F.slice("hset", 1, KMV_K).alias("sketch"),
    ).persist()

    a = d.select(
        F.col("source"),
        F.col("doc_id").alias("left_id"),
        F.col("hset").alias("ha"),
        F.col("sketch").alias("sa"),
    )
    b = d.select(
        F.col("source"),
        F.col("doc_id").alias("right_id"),
        F.col("hset").alias("hb"),
        F.col("sketch").alias("sb"),
    )
    pairs = a.join(b, "source").filter(
        F.col("left_id") != F.col("right_id")
    )
    containment = F.round(
        F.size(F.array_intersect("ha", "hb")) * 1.0 / F.size("ha"), 6
    )
    union_sketch = F.slice(
        F.array_sort(F.array_distinct(F.concat("sa", "sb"))), 1, KMV_K
    )
    kmv_est = F.round(
        F.size(
            F.filter(
                union_sketch,
                lambda h: F.array_contains(F.col("sa"), h)
                & F.array_contains(F.col("sb"), h),
            )
        )
        * 1.0
        / F.least(
            F.size(F.array_distinct(F.concat("sa", "sb"))), F.lit(KMV_K)
        ),
        6,
    )
    return (
        pairs.select(
            "left_id",
            "right_id",
            containment.alias("exact_containment"),
            kmv_est.alias("kmv_jaccard_est"),
        )
        .filter(F.col("exact_containment") >= CONTAINMENT_MIN)
    )


@register(
    "q6_forecast_revenue",
    """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_delta_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: multi-predicate scan + single aggregate — the
    pure-pushdown query (every predicate reaches the parquet reader)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * F.col("l_discount") * 100
            ).cast("long")
        ).alias("revenue_delta_cents"),
        F.count("*").alias("n_lines"),
    )


@register(
    "array_functions",
    """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 50
)
SELECT vec_id,
       CAST(len(e) AS INTEGER) AS dim,
       e[1] AS first_comp,
       e[len(e)] AS last_comp,
       round(list_max(e), 6) AS max_comp,
       round(list_min(e), 6) AS min_comp,
       CAST(len(list_filter(e, x -> x > 0)) AS INTEGER) AS n_positive,
       round(list_sort(e)[len(e) // 2 + 1], 6) AS middle_sorted,
       round(e[1] + e[2], 6) AS head_sum,
       CAST(list_contains([x > 0.5 for x in e], true) AS BOOLEAN)
         AS any_gt_half
FROM v
""",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order function suite over embedding columns: size,
    indexing, min/max, filter-count, sort-index, exists — the SQL
    vocabulary for vector columns beyond the dot-product kernels."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 50
    )
    e = F.col("embedding").cast("array<double>")
    d = emb.select("vec_id", e.alias("e"))
    return d.select(
        "vec_id",
        F.size("e").alias("dim"),
        F.element_at("e", 1).alias("first_comp"),
        F.element_at("e", F.size("e")).alias("last_comp"),
        F.round(F.array_max("e"), 6).alias("max_comp"),
        F.round(F.array_min("e"), 6).alias("min_comp"),
        F.size(F.filter("e", lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.element_at(
                F.array_sort("e"),
                (F.size("e") / F.lit(2)).cast("int") + 1,
            ),
            6,
        ).alias("middle_sorted"),
        F.round(
            F.element_at("e", 1) + F.element_at("e", 2), 6
        ).alias("head_sum"),
        F.exists("e", lambda x: x > 0.5).alias("any_gt_half"),
    )


@register(
    "lineitem_cube",
    """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations with grouping() flags
    (completes the rollup/cube/grouping-sets family)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               count(*) AS n,
               sum(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        """
    )


@register(
    "null_safe_join",
    """
WITH e AS (
  SELECT event_id,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et
  FROM events WHERE event_id < 2000
)
SELECT a.event_id AS left_id, b.event_id AS right_id
FROM e a
JOIN e b ON a.et IS NOT DISTINCT FROM b.et AND a.event_id + 1 = b.event_id
""",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) as a join key —
    NULL matches NULL, unlike plain '=' which drops those rows."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 2000
    )
    e = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("event_type"))
        .alias("et"),
    )
    a = e.select(F.col("event_id").alias("left_id"), F.col("et").alias("ea"))
    b = e.select(F.col("event_id").alias("right_id"), F.col("et").alias("eb"))
    return a.join(
        b,
        a.ea.eqNullSafe(b.eb)
        & (F.col("left_id") + 1 == F.col("right_id")),
    ).select("left_id", "right_id")


@register(
    "document_chunks",
    """
WITH tok AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents WHERE doc_id < 100
), st AS (
  SELECT doc_id, toks,
         range(1, greatest(len(toks) - 10, 1) + 1, 30) AS starts
  FROM tok
), ex AS (
  SELECT doc_id, toks,
         generate_subscripts(starts, 1) - 1 AS chunk_idx,
         unnest(starts) AS start
  FROM st
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(toks[start:start + 39], ' ') AS chunk_text,
       CAST(len(toks[start:start + 39]) AS INTEGER) AS n_tokens
FROM ex
""",
)
def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (size 40, overlap 10,
    stride 30) — the sequence-prep primitive for pre-training data.
    Pure array projection, no shuffle."""
    from oracle_vector_search_spark.operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    return chunk_documents(docs, chunk_size=40, overlap=10)


@register(
    "packed_context_bins",
    """
WITH tok AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents WHERE doc_id < 100
), st AS (
  SELECT doc_id, toks,
         range(1, greatest(len(toks) - 10, 1) + 1, 30) AS starts
  FROM tok
), ex AS (
  SELECT doc_id,
         generate_subscripts(starts, 1) - 1 AS chunk_idx,
         len(toks[unnest(starts):unnest(starts) + 39]) AS n_tokens
  FROM st
), binned AS (
  SELECT doc_id, chunk_idx, n_tokens,
         CAST((doc_id % 8) * 1099511627776
              + floor(coalesce(sum(n_tokens) OVER (
                  PARTITION BY doc_id % 8
                  ORDER BY doc_id, chunk_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 256) AS BIGINT) AS bin_id
  FROM ex
)
SELECT bin_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM binned
GROUP BY bin_id
""",
)
def packed_context_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: chunks → 256-token bins by cumulative
    offset within a doc_id-mod shard (the offset window is PARTITIONED
    by shard, so packing parallelizes and bins never span shards);
    per-bin stats. bin_id = shard * 2^40 + local_bin on both engines."""
    from oracle_vector_search_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    chunks = chunk_documents(docs, chunk_size=40, overlap=10)
    binned = pack_chunks(chunks, window_tokens=256, num_shards=8)
    return binned.groupBy("bin_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@register(
    "packed_bins_greedy",
    """
WITH tok AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents WHERE doc_id < 100
), st AS (
  SELECT doc_id, toks,
         range(1, greatest(len(toks) - 10, 1) + 1, 30) AS starts
  FROM tok
), ex AS (
  SELECT doc_id,
         generate_subscripts(starts, 1) - 1 AS chunk_idx,
         len(toks[unnest(starts):unnest(starts) + 39]) AS n_tokens
  FROM st
), shard_tok AS (
  SELECT doc_id % 32 AS shard, sum(n_tokens) AS shard_tokens
  FROM ex GROUP BY doc_id % 32
)
SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_chunks,
       CAST((SELECT count(DISTINCT doc_id * 100000 + chunk_idx) FROM ex)
            AS BIGINT) AS n_chunks_distinct,
       CAST((SELECT sum(n_tokens) FROM ex) AS BIGINT) AS total_tokens,
       CAST((SELECT sum(CAST(ceil(shard_tokens / 256.0) AS BIGINT))
             FROM shard_tok) AS BIGINT) AS bins_lower_bound,
       TRUE AS assigned_exactly_once,
       TRUE AS no_bin_over_budget,
       TRUE AS bins_ge_lower_bound
""",
)
def packed_bins_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT greedy first-fit packing (applyInPandas per shard): unlike
    the offset-based variant, no bin exceeds the token budget (except a
    single oversized chunk, which gets its own bin).

    The per-bin walk is a sequential fold, so the bin ASSIGNMENT has no
    SQL twin — but its correctness INVARIANTS are exact aggregates
    (VERDICT r4 #2), and that is what this query emits, all
    oracle-checked: every chunk assigned exactly once (chunk counts are
    SQL-derivable from the chunker), no bin over the 256-token budget
    unless single-chunk, and the bin count at least the per-shard
    pigeonhole lower bound Σ_shard ceil(tokens/256) (bins never span
    shards). The flags are computed Spark-side FROM the packed output
    and emitted as booleans the oracle pins to TRUE — a packing bug
    hash-mismatches the gate. Full per-bin detail stays property-tested
    in tests/test_scale_ops.py."""
    from oracle_vector_search_spark.operators.chunking import (
        chunk_documents,
        pack_chunks_greedy,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    chunks = chunk_documents(docs, chunk_size=40, overlap=10)
    packed = pack_chunks_greedy(chunks, window_tokens=256)
    bins = packed.groupBy("bin_id").agg(
        F.count("*").alias("bn"), F.sum("n_tokens").alias("btok")
    )
    bin_stats = bins.agg(
        F.count("*").alias("n_bins"),
        F.max(
            ((F.col("btok") > 256) & (F.col("bn") > 1)).cast("int")
        ).alias("over_budget"),
    )
    chunk_stats = packed.agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct(
            F.col("doc_id") * 100000 + F.col("chunk_idx")
        ).alias("n_chunks_distinct"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    lower = (
        packed.withColumn(
            "shard", F.pmod(F.col("doc_id").cast("long"), F.lit(32))
        )
        .groupBy("shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .agg(
            F.sum(
                F.ceil(F.col("shard_tokens") / F.lit(256.0))
            ).alias("bins_lower_bound")
        )
    )
    return (
        chunk_stats.crossJoin(F.broadcast(bin_stats))
        .crossJoin(F.broadcast(lower))
        .select(
            "n_chunks",
            "n_chunks_distinct",
            "total_tokens",
            "bins_lower_bound",
            (F.col("n_chunks") == F.col("n_chunks_distinct")).alias(
                "assigned_exactly_once"
            ),
            (F.col("over_budget") == 0).alias("no_bin_over_budget"),
            (F.col("n_bins") >= F.col("bins_lower_bound")).alias(
                "bins_ge_lower_bound"
            ),
        )
    )


HEAVY_K = 30  # heavy hitter := frequency strictly above total/HEAVY_K


@register(
    "heavy_hitter_tokens_twophase",
    f"""
WITH tok AS (
  SELECT unnest(string_split(
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok
)
SELECT t.token,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 / any_value(tot.n_total), 6) AS share
FROM tok t CROSS JOIN tot
GROUP BY t.token
HAVING count(*) * {HEAVY_K} > any_value(tot.n_total)
""",
)
def heavy_hitter_tokens_twophase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact heavy hitters (tokens with frequency > N/k) found with the
    two-phase Misra-Gries-style candidate pass a 100 TB vocabulary
    needs.

    Phase 1 never shuffles the full token stream on token: each input
    partition p finds its LOCAL heavy hitters (count_p * k >
    n_p). Pigeonhole guarantees the candidate set is a superset of the
    global answer — if count(x) * k > N globally, then count_p(x) * k >
    n_p in at least one partition. Phase 2 exact-counts ONLY the
    candidates (semi-join, broadcast — candidate count is bounded by
    partitions * k) and applies the exact global filter, so the result
    is identical for ANY partition layout. The oracle is the plain
    exact SQL; correctness does not depend on where Spark split the
    input.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.withColumn("norm", T.norm_text("text"))
        .select(F.explode(T.tokens("norm")).alias("token"))
    )
    # phase 1: per-partition local heavy hitters (map-side, no token shuffle)
    part = toks.withColumn("pid", F.spark_partition_id())
    local = part.groupBy("pid", "token").agg(F.count("*").alias("cnt"))
    local_tot = part.groupBy("pid").agg(F.count("*").alias("n_p"))
    cand = (
        local.join(F.broadcast(local_tot), "pid")
        .filter(F.col("cnt") * HEAVY_K > F.col("n_p"))
        .select("token")
        .distinct()
    )
    # phase 2: exact global counts for candidates only
    total = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * HEAVY_K > F.col("n_total"))
        .select(
            "token",
            "n",
            F.round(F.col("n") * 1.0 / F.col("n_total"), 6).alias("share"),
        )
    )


_CM_DEPTH = 4
_CM_WIDTH = 1024


@register(
    "countmin_token_freq_audit",
    f"""
WITH toks AS (
  SELECT unnest(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
),
cells AS (
  SELECT r,
         CAST(('0x' || substr(md5(tok || ':' || r), 1, 7)) AS BIGINT)
           % {_CM_WIDTH} AS cell,
         CAST(count(*) AS BIGINT) AS cell_n
  FROM toks, (SELECT unnest(range({_CM_DEPTH})) AS r)
  GROUP BY r, cell
),
exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM toks GROUP BY tok
),
top AS (
  SELECT tok, exact_n FROM exact
  ORDER BY exact_n DESC, tok LIMIT 10
),
probes AS (
  SELECT t.tok, t.exact_n, r.r,
         CAST(('0x' || substr(md5(t.tok || ':' || r.r), 1, 7)) AS BIGINT)
           % {_CM_WIDTH} AS cell
  FROM top t, (SELECT unnest(range({_CM_DEPTH})) AS r) r
),
est AS (
  SELECT p.tok, p.exact_n, min(c.cell_n) AS est_n
  FROM probes p JOIN cells c ON c.r = p.r AND c.cell = p.cell
  GROUP BY p.tok, p.exact_n
)
SELECT tok, exact_n, CAST(est_n AS BIGINT) AS est_n,
       CAST(est_n - exact_n AS BIGINT) AS overcount
FROM est
ORDER BY exact_n DESC, tok
""",
)
def countmin_token_freq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch fidelity audit: a 4x1024 CM
    sketch of the token stream (portable md5-derived row hashes, so
    BOTH engines build the identical sketch), probed for the 10 most
    frequent tokens against their exact counts. Count-Min never
    undercounts — ``overcount >= 0`` always — and the audit reports the
    actual collision inflation, the number that sizes width/depth
    before trusting the sketch on a 100 TB stream the exact counter
    can't afford.

    Shape at scale: the sketch is a groupBy on (row, cell) — at most
    depth×width cells regardless of input size — and merges across
    partitions/streams by cell-wise addition (the CM monoid)."""
    from oracle_vector_search_spark.functions.text import (
        hash28_sql,
        norm_text,
    )

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(norm_text("text").alias("norm"))
        .select(F.explode(F.split("norm", " ")).alias("tok"))
    )
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(_CM_DEPTH)])
    ).alias("r")
    cell = (
        F.expr(hash28_sql("concat(tok, ':', cast(r as string))"))
        % _CM_WIDTH
    ).alias("cell")
    cells = (
        toks.select("tok", rows)
        .select("r", cell)
        .groupBy("r", "cell")
        .agg(F.count("*").alias("cell_n"))
    )
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_n"))
    from oracle_vector_search_spark.operators.topk import global_topn_ranked

    top = global_topn_ranked(
        exact, 10, F.desc("exact_n"), F.asc("tok")
    ).select("tok", "exact_n")
    probes = top.select("tok", "exact_n", rows).select(
        "tok", "exact_n", "r", cell
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "cell"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cell_n").alias("est_n"))
    )
    return est.select(
        "tok",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overcount"),
    ).orderBy(F.desc("exact_n"), "tok")


# -- synopsis-based approximate range aggregates (PolyFit-inspired) --
#
# "PolyFit: Polynomial-based Indexing Approach for Fast Approximate
# Range Aggregate Queries" (EDBT 2021, PAPERS.md) answers range
# COUNT/SUM from a fitted CDF model instead of scanning. The engine's
# exact-arithmetic rendition: a B-bucket equal-width count synopsis
# (the at-rest "model" — B rows, scan-free to query) answers range
# counts by whole buckets + integer-interpolated boundary buckets, and
# the audit reports the exact error next to every estimate.

_SYN_BUCKETS = 64
_SYN_RANGES = [(1, 3), (2, 7), (4, 5), (0, 9), (6, 10)]  # tenths of span


@register(
    "synopsis_range_count_audit",
    f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), bounds AS (
  SELECT min(cents) AS mn, max(cents) AS mx FROM c
), syn AS (
  SELECT least(CAST(((cents - mn) * {_SYN_BUCKETS})
                    // (mx - mn + 1) AS BIGINT),
               {_SYN_BUCKETS - 1}) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM c, bounds GROUP BY 1
), ranges AS (
  SELECT u.rid, mn + (mx - mn) * u.lo10 // 10 AS lo,
         mn + (mx - mn) * u.hi10 // 10 AS hi
  FROM bounds,
       (SELECT unnest([{", ".join(
           f"{{'rid': {i}, 'lo10': {lo}, 'hi10': {hi}}}"
           for i, (lo, hi) in enumerate(_SYN_RANGES))}]) AS u)
), est AS (
  SELECT r.rid, r.lo, r.hi,
         CAST(sum(
           CASE WHEN b_lo >= r.lo AND b_hi <= r.hi THEN s.cnt
                ELSE s.cnt * greatest(least(b_hi, r.hi)
                                      - greatest(b_lo, r.lo) + 1, 0)
                     // (b_hi - b_lo + 1) END) AS BIGINT) AS approx_count
  FROM ranges r, bounds,
       (SELECT bucket, cnt,
               mn + bucket * (mx - mn + 1) // {_SYN_BUCKETS} AS b_lo,
               mn + (bucket + 1) * (mx - mn + 1) // {_SYN_BUCKETS} - 1
                 AS b_hi
        FROM syn, bounds) s
  WHERE s.b_hi >= r.lo AND s.b_lo <= r.hi
  GROUP BY r.rid, r.lo, r.hi
), exact AS (
  SELECT r.rid, CAST(count(*) AS BIGINT) AS exact_count
  FROM ranges r JOIN c ON c.cents BETWEEN r.lo AND r.hi
  GROUP BY r.rid
)
SELECT e.rid, e.lo, e.hi, e.approx_count, x.exact_count,
       CAST(abs(e.approx_count - x.exact_count) AS BIGINT) AS abs_err
FROM est e JOIN exact x USING (rid)
ORDER BY rid
""",
)
def synopsis_range_count_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate range counts from a B-row at-rest synopsis
    (PolyFit's premise in exact-integer form): whole buckets
    contribute their counts, boundary buckets an
    integer-interpolated share — no fact-table scan at query time;
    the audit joins the exact counts back and reports per-range
    absolute error.

    Scale shape: the synopsis is ONE aggregation at build time
    (B=64 rows at rest); every range query after that touches B rows.
    All arithmetic is BIGINT (uniform-within-bucket interpolation via
    integer cross-multiply), so estimate and error are engine-exact.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    bounds = o.agg(
        F.min("cents").alias("mn"), F.max("cents").alias("mx")
    )
    cb = o.crossJoin(F.broadcast(bounds))
    syn = (
        cb.select(
            F.least(
                F.expr(
                    f"(cents - mn) * {_SYN_BUCKETS} div (mx - mn + 1)"
                ),
                F.lit(_SYN_BUCKETS - 1),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )
    ranges_rows = ", ".join(
        f"struct({i} as rid, {lo} as lo10, {hi} as hi10)"
        for i, (lo, hi) in enumerate(_SYN_RANGES)
    )
    ranges = (
        spark.range(1)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.explode(F.expr(f"array({ranges_rows})")).alias("u"),
            "mn",
            "mx",
        )
        .select(
            F.col("u.rid").alias("rid"),
            F.expr("mn + (mx - mn) * u.lo10 div 10").alias("lo"),
            F.expr("mn + (mx - mn) * u.hi10 div 10").alias("hi"),
        )
    )
    sb = (
        syn.crossJoin(F.broadcast(bounds))
        .select(
            "bucket",
            "cnt",
            F.expr(
                f"mn + bucket * (mx - mn + 1) div {_SYN_BUCKETS}"
            ).alias("b_lo"),
            F.expr(
                f"mn + (bucket + 1) * (mx - mn + 1) div {_SYN_BUCKETS} - 1"
            ).alias("b_hi"),
        )
    )
    est = (
        sb.join(
            F.broadcast(ranges),
            (F.col("b_hi") >= F.col("lo")) & (F.col("b_lo") <= F.col("hi")),
        )
        .select(
            "rid",
            "lo",
            "hi",
            F.when(
                (F.col("b_lo") >= F.col("lo"))
                & (F.col("b_hi") <= F.col("hi")),
                F.col("cnt"),
            )
            .otherwise(
                F.expr(
                    "cnt * greatest(least(b_hi, hi) - greatest(b_lo, lo)"
                    " + 1, 0) div (b_hi - b_lo + 1)"
                )
            )
            .alias("contrib"),
        )
        .groupBy("rid", "lo", "hi")
        .agg(F.sum("contrib").cast("long").alias("approx_count"))
    )
    exact = (
        o.join(
            F.broadcast(ranges),
            (F.col("cents") >= F.col("lo"))
            & (F.col("cents") <= F.col("hi")),
        )
        .groupBy("rid")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        est.join(exact, "rid")
        .select(
            "rid",
            "lo",
            "hi",
            "approx_count",
            "exact_count",
            F.abs(F.col("approx_count") - F.col("exact_count"))
            .cast("bigint")
            .alias("abs_err"),
        )
        .orderBy("rid")
    )


# ------------------------------------------------ HyperLogLog from scratch
HLL_M = 128  # registers (b=7); stderr = 1.04/sqrt(128) = 9.2%
# h is the 60-bit portable hash; w = h div m has 53 bits, so rank
# (leading zeros + 1) is 54 - bit_length(w), with w=0 -> 54.


@register(
    "hll_distinct_users_audit",
    f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS hv
  FROM events
), rr AS (
  SELECT hv % {HLL_M} AS reg,
         CASE WHEN hv // {HLL_M} = 0 THEN 54
              ELSE 54 - length(printf('%b', hv // {HLL_M})) END AS rank
  FROM h
), regs AS (
  SELECT reg, max(rank) AS m_rank FROM rr GROUP BY reg
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_occupied,
         CAST(sum(1::BIGINT << (54 - m_rank)) AS BIGINT) AS s_occ
  FROM regs
), ex AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events
), est AS (
  SELECT n_occupied, n_exact,
         CAST({HLL_M} AS BIGINT) - n_occupied AS n_zero_regs,
         s_occ + (({HLL_M}::BIGINT - n_occupied) << 54) AS s_scaled
  FROM agg, ex
), e2 AS (
  SELECT *,
         (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
           * 18014398509481984.0 / s_scaled AS raw_est
  FROM est
)
SELECT CAST({HLL_M} AS INTEGER) AS m, n_exact, n_zero_regs, s_scaled,
       CAST(floor(raw_est * 1000.0) AS BIGINT) AS est_raw_milli,
       abs(CASE WHEN raw_est <= 2.5 * {HLL_M} AND n_zero_regs > 0
                THEN {HLL_M}.0 * ln({HLL_M}.0 / n_zero_regs)
                ELSE raw_est END - n_exact) <= 0.25 * n_exact
         AS within_tolerance
FROM e2
""",
)
def hll_distinct_users_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HyperLogLog built from scratch on the portable hash family
    (Flajolet et al. 2007): register = h mod m, rank = leading zeros
    of h div m, registers = ``groupBy(reg).max(rank)`` — a fully
    distributive aggregation, so at 100 TB the register table is the
    MERGEABLE at-rest sketch: per-partition/per-day register tables
    max-merge into any rollup without rescanning (the same at-rest
    discipline as the minhash/fingerprint tables). The harmonic sum is
    kept EXACT as Σ 2^(54-M_j) in BIGINT (order-independent integer
    adds — no float accumulation), so both engines derive the same
    estimate bit-for-bit; the small-range linear-counting correction
    feeds only the tolerance flag. The oracle recomputes every piece
    including exact COUNT(DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.selectExpr(
        "cast(conv(substr(md5(cast(user_id as string)), 1, 15), 16, 10)"
        " as bigint) AS hv"
    )
    rr = h.selectExpr(
        f"pmod(hv, {HLL_M}) AS reg",
        f"CASE WHEN hv div {HLL_M} = 0 THEN 54 "
        f"ELSE 54 - length(bin(hv div {HLL_M})) END AS rank",
    )
    regs = rr.groupBy("reg").agg(F.max("rank").alias("m_rank"))
    agg = regs.agg(
        F.count("*").cast("long").alias("n_occupied"),
        F.sum(
            F.expr("shiftleft(cast(1 as bigint), 54 - m_rank)")
        ).alias("s_occ"),
    )
    ex = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    alpha = f"(0.7213 / (1.0 + 1.079 / {HLL_M}.0))"
    pow54 = "18014398509481984.0"  # 2^54, exact double literal
    return (
        agg.crossJoin(ex)
        .selectExpr(
            "n_occupied",
            "n_exact",
            f"cast({HLL_M} as bigint) - n_occupied AS n_zero_regs",
            f"s_occ + shiftleft(cast({HLL_M} as bigint) - n_occupied, 54)"
            " AS s_scaled",
        )
        .selectExpr(
            f"cast({HLL_M} as int) AS m",
            "n_exact",
            "n_zero_regs",
            "s_scaled",
            f"cast(floor({alpha} * {HLL_M}.0 * {HLL_M}.0 * {pow54}"
            " / s_scaled * 1000.0) as bigint) AS est_raw_milli",
            f"abs(CASE WHEN {alpha} * {HLL_M}.0 * {HLL_M}.0 * {pow54}"
            f" / s_scaled <= 2.5 * {HLL_M} AND n_zero_regs > 0"
            f" THEN {HLL_M}.0 * ln({HLL_M}.0 / n_zero_regs)"
            f" ELSE {alpha} * {HLL_M}.0 * {HLL_M}.0 * {pow54}"
            " / s_scaled END - n_exact) <= 0.25 * n_exact"
            " AS within_tolerance",
        )
    )


# ---------------------------------------------- two-sample KS drift test
@register(
    "value_ks_drift_audit",
    """
WITH s AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('view', 'purchase')
), n AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
         CAST(sum(1 - is_a) AS BIGINT) AS n_b
  FROM s
), pts AS (
  SELECT v, CAST(sum(is_a) AS BIGINT) AS ca_here,
         CAST(sum(1 - is_a) AS BIGINT) AS cb_here
  FROM s GROUP BY v
), cum AS (
  SELECT v,
         sum(ca_here) OVER (ORDER BY v) AS ca,
         sum(cb_here) OVER (ORDER BY v) AS cb
  FROM pts
)
SELECT n.n_a AS n_view, n.n_b AS n_purchase,
       CAST(max(abs(ca * n.n_b - cb * n.n_a)) AS BIGINT) AS ks_num,
       CAST(floor(max(abs(ca * n.n_b - cb * n.n_a)) * 1000.0
                  / (n.n_a * n.n_b)) AS BIGINT) AS ks_milli,
       max(abs(ca * n.n_b - cb * n.n_a)) * 1.0 / (n.n_a * n.n_b)
         > 1.358 * sqrt((n.n_a + n.n_b) * 1.0 / (n.n_a * n.n_b))
         AS drift_at_5pct
FROM cum, n
GROUP BY n.n_a, n.n_b
""",
)
def value_ks_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the 'view' and
    'purchase' value distributions — the distribution-shift gate a
    training pipeline runs between corpus snapshots. The statistic is
    kept EXACT: D = max|F_a - F_b| is computed as the integer
    max|c_a·n_b - c_b·n_a| over the pooled support (cross-multiplied,
    no division until the final milli projection), so both engines
    agree bit-for-bit; the 5% decision uses the asymptotic critical
    value c(α)·sqrt((n_a+n_b)/(n_a·n_b)), c(0.05)=1.358.

    Scale: one groupBy on the value grid + one ordered prefix-sum
    window over the DISTINCT support (value-grid-sized, not
    corpus-sized) — the CDF never materializes per-row."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    s = ev.select(
        F.floor(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("event_type") == "view", 1)
        .otherwise(0)
        .alias("is_a"),
    )
    n = s.agg(
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).cast("long").alias("n_b"),
    )
    pts = s.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("ca_here"),
        F.sum(F.lit(1) - F.col("is_a")).cast("long").alias("cb_here"),
    )
    # bounded_global_order: input is the DISTINCT value grid
    # (floor(value*100) — range-capped, never corpus-sized)
    w = bounded_global_order(
        pts,
        F.asc("v"),
        bound="distinct floor(value*100) grid — range-capped",
        max_rows=100_000,
    ).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = pts.select(
        "v",
        F.sum("ca_here").over(w).alias("ca"),
        F.sum("cb_here").over(w).alias("cb"),
    )
    d = cum.crossJoin(F.broadcast(n)).agg(
        F.first("n_a").alias("n_view"),
        F.first("n_b").alias("n_purchase"),
        F.max(
            F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
        )
        .cast("long")
        .alias("ks_num"),
    )
    return d.selectExpr(
        "n_view",
        "n_purchase",
        "ks_num",
        "cast(floor(ks_num * 1000.0 / (n_view * n_purchase)) as bigint)"
        " AS ks_milli",
        "ks_num * 1.0 / (n_view * n_purchase)"
        " > 1.358 * sqrt((n_view + n_purchase) * 1.0"
        " / (n_view * n_purchase)) AS drift_at_5pct",
    )


# ------------------- q-digest mergeable quantile sketch (round 8)

_QD_K = 10  # tree depth: leaves = dollar buckets [0, 1024)
_QD_SIGMA = 64  # compression: threshold T = n // sigma
_QD_PCTS = (25, 50, 75, 90, 99)


def _qdigest_oracle() -> str:
    """Generate the level-sweep CTE chain: the EXACT bottom-up q-digest
    compression (Shrivastava et al. 2004) as plain SQL — sweep level
    l = {_QD_K}..1, merging each sibling pair into its parent whenever
    pair_sum + parent_count ≤ T.  Node ids are heap-numbered (leaf i ↔
    1024 + i, parent = id // 2); level and range derive from the bin()
    length, so everything is integer-exact."""
    lines = [
        f"""
WITH n11 AS MATERIALIZED (
  SELECT 1024 + CAST(least(greatest(floor(value), 0), 1023) AS BIGINT)
           AS id,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(cnt) AS BIGINT) // {_QD_SIGMA} AS t
  FROM n11
)"""
    ]
    cur = "n11"
    for l in range(_QD_K, 0, -1):
        lo, hi = 1 << l, 1 << (l + 1)
        nxt = f"n{l - 1:02d}"
        lines.append(
            f""", m{l:02d} AS MATERIALIZED (
  SELECT s.pid,
         (s.ps + coalesce(p.cnt, 0)) <= (SELECT t FROM tot) AS mrg
  FROM (SELECT id // 2 AS pid, CAST(sum(cnt) AS BIGINT) AS ps
        FROM {cur} WHERE id >= {lo} AND id < {hi}
        GROUP BY id // 2) s
  LEFT JOIN (SELECT id, cnt FROM {cur}
             WHERE id >= {lo // 2} AND id < {lo}) p
    ON p.id = s.pid
), {nxt} AS MATERIALIZED (
  SELECT id, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
    SELECT id, cnt FROM {cur} WHERE id < {lo} OR id >= {hi}
    UNION ALL
    SELECT CASE WHEN m.mrg THEN q.id // 2 ELSE q.id END AS id, q.cnt
    FROM {cur} q JOIN m{l:02d} m ON q.id // 2 = m.pid
    WHERE q.id >= {lo} AND q.id < {hi}
  ) GROUP BY id
)"""
        )
        cur = nxt
    lines.append(
        f""", digest AS (
  SELECT id, cnt,
         length(bin(id)) - 1 AS lvl,
         (id - (1 << (length(bin(id)) - 1)))
           * (1 << ({_QD_K} - (length(bin(id)) - 1))) AS lo,
         (id - (1 << (length(bin(id)) - 1)) + 1)
           * (1 << ({_QD_K} - (length(bin(id)) - 1))) - 1 AS hi
  FROM {cur} WHERE cnt > 0
), qs AS (
  SELECT unnest([{", ".join(str(p) for p in _QD_PCTS)}]) AS pct
), ranks AS (
  SELECT q.pct, (q.pct * t.n + 99) // 100 AS r, t.n
  FROM qs q CROSS JOIN tot t
), cum AS (
  SELECT d.hi, d.lo,
         sum(d.cnt) OVER (ORDER BY d.hi, d.hi - d.lo
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM digest d
), est AS (
  SELECT r.pct, min(u.hi) AS est_dollar
  FROM ranks r JOIN cum u ON u.c >= r.r
  GROUP BY r.pct
), leafcum AS (
  SELECT id - 1024 AS leaf,
         sum(cnt) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS c
  FROM n11
), exact AS (
  SELECT r.pct, min(u.leaf) AS exact_dollar
  FROM ranks r JOIN leafcum u ON u.c >= r.r
  GROUP BY r.pct
)
SELECT CAST(r.pct AS BIGINT) AS quantile_pct,
       r.n AS n,
       (SELECT CAST(count(*) AS BIGINT) FROM digest) AS digest_size,
       CAST(e.est_dollar AS BIGINT) AS est_dollar,
       CAST(x.exact_dollar AS BIGINT) AS exact_dollar,
       CAST(e.est_dollar - x.exact_dollar AS BIGINT) AS err_dollars
FROM ranks r JOIN est e ON e.pct = r.pct
JOIN exact x ON x.pct = r.pct
ORDER BY quantile_pct"""
    )
    return "".join(lines)


@register("qdigest_quantile_audit", _qdigest_oracle())
def qdigest_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile SKETCH with a deterministic build — q-digest
    (Shrivastava et al. 2004): event values bucket into 1024 dollar
    leaves of a binary range tree; the bottom-up compression merges
    each sibling pair into its parent whenever pair + parent counts ≤
    n/σ (σ={_QD_SIGMA}), leaving O(σ·log D) nodes whose ranges answer
    any quantile within n·log(D)/σ rank error.  Unlike KLL/GK (whose
    compaction depends on arrival order — not partition-invariant),
    the q-digest is a pure function of the exact leaf HISTOGRAM, so a
    distributed build is deterministic and the whole construction is
    oracle-checkable: the DuckDB side replays all {_QD_K} level sweeps
    as generated SQL.  The audit emits sketch-vs-exact answers for
    {len(_QD_PCTS)} quantiles side by side.

    Physical shape: ONE count shuffle builds the leaf histogram; the
    histogram is DOMAIN-bounded (≤1024 rows regardless of n — 100 TB
    of events still yields ≤1024 leaves), so the compression runs
    driver-side on sketch-sized data (the bloom-filter precedent:
    bounded, documented) and the digest broadcasts back for the
    window-based quantile reads.  Merging two digests = summing leaf
    histograms before compression — the mergeability that makes this
    the right shape for per-partition → global rollups at scale."""
    ev = load_table(spark, sf_dir, "events")
    leaves = (
        ev.select(
            F.least(
                F.greatest(F.floor("value"), F.lit(0)), F.lit(1023)
            )
            .cast("long")
            .alias("leaf")
        )
        .groupBy("leaf")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    hist = {
        int(r["leaf"]): int(r["cnt"]) for r in leaves.collect()
    }  # domain-bounded: ≤1024 rows at ANY data scale
    n = sum(hist.values())
    t = n // _QD_SIGMA
    nodes = {1024 + leaf: c for leaf, c in hist.items() if c > 0}
    for l in range(_QD_K, 0, -1):
        lo, hi = 1 << l, 1 << (l + 1)
        by_pid: dict[int, int] = {}
        for nid, c in nodes.items():
            if lo <= nid < hi:
                by_pid[nid // 2] = by_pid.get(nid // 2, 0) + c
        for pid, ps in sorted(by_pid.items()):
            if ps + nodes.get(pid, 0) <= t:
                nodes[pid] = nodes.get(pid, 0) + ps
                for child in (2 * pid, 2 * pid + 1):
                    nodes.pop(child, None)
    digest_rows = []
    for nid, c in sorted(nodes.items()):
        lvl = nid.bit_length() - 1
        span = 1 << (_QD_K - lvl)
        nlo = (nid - (1 << lvl)) * span
        digest_rows.append((nid, c, nlo, nlo + span - 1))
    digest = spark.createDataFrame(
        digest_rows, "id long, cnt long, lo long, hi long"
    )
    ranks = spark.createDataFrame(
        [(p, (p * n + 99) // 100) for p in _QD_PCTS],
        "pct long, r long",
    )
    # bounded_global_order: digest is the driver-compressed q-digest
    # node set (<= 3/sigma, <= 1024 nodes at any corpus scale — the
    # compression invariant), same argument as wleaf below
    wcum = bounded_global_order(
        digest,
        F.asc("hi"),
        F.asc(F.col("hi") - F.col("lo")),
        bound="q-digest nodes <= 3/sigma by compression invariant",
        max_rows=1024,
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = digest.select("hi", F.sum("cnt").over(wcum).alias("c"))
    est = (
        F.broadcast(ranks)
        .join(cum, F.col("c") >= F.col("r"))
        .groupBy("pct", "r")
        .agg(F.min("hi").alias("est_dollar"))
    )
    # bounded_global_order: leaves is the 2^k q-digest leaf domain
    # (<= 1024 rows by construction)
    wleaf = bounded_global_order(
        leaves,
        F.asc("leaf"),
        bound="q-digest leaf domain, <= 1024 by construction",
        max_rows=1024,
    ).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    leafcum = leaves.select(
        "leaf", F.sum("cnt").over(wleaf).alias("c")
    )
    exact = (
        F.broadcast(ranks)
        .join(leafcum, F.col("c") >= F.col("r"))
        .groupBy("pct")
        .agg(F.min("leaf").alias("exact_dollar"))
    )
    return (
        est.join(exact, "pct")
        .select(
            F.col("pct").alias("quantile_pct"),
            F.lit(n).cast("long").alias("n"),
            F.lit(len(digest_rows)).cast("long").alias("digest_size"),
            F.col("est_dollar").cast("long"),
            F.col("exact_dollar").cast("long"),
            (F.col("est_dollar") - F.col("exact_dollar"))
            .cast("long")
            .alias("err_dollars"),
        )
        .orderBy("quantile_pct")
    )


# -------------------------------------------------- Bloom-filter audit

# Bloom membership sketch over the TRAIN split's normalized-text
# fingerprints, probed by the EVAL split — the standing-corpus
# admission sketch ("is this incoming document already in the
# corpus?") with its false-positive rate measured against exact
# membership. Completes the sketch-audit family (HLL, CountMin,
# q-digest, KMV, MinHash error) with the membership sketch.
_BLOOM_M = 65_536  # bits; fill ~0.22 at sf0.01 -> FPR ~1% at k=3
_BLOOM_K = 3  # hash functions (independent md5 salts)


def _bloom_pos_spark(salt: int, norm: str) -> str:
    """Spark SQL fragment: Bloom bit position ``salt`` of a normalized
    text — the portable hash60 family under an md5 salt, mod m."""
    inner = T.hash60_sql(f"concat('bloom{salt}:', {norm})")
    return f"({inner}) % {_BLOOM_M}"


def _bloom_pos_duck(salt: int, norm: str) -> str:
    return (
        f"(('0x' || substr(md5('bloom{salt}:' || {norm}), 1, 15))::BIGINT)"
        f" % {_BLOOM_M}"
    )


@register(
    "bloom_dedup_fpr_audit",
    f"""
WITH base AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
), train AS (
  SELECT * FROM base WHERE doc_id % 7 <> 0
), eval_set AS (
  SELECT * FROM base WHERE doc_id % 7 = 0
  UNION ALL
  SELECT -doc_id - 1 AS doc_id, source, norm
  FROM train WHERE doc_id % 97 = 3
), bits AS (
  SELECT DISTINCT pos FROM train, UNNEST([
    {', '.join(_bloom_pos_duck(i, 'norm') for i in range(_BLOOM_K))}
  ]) AS t(pos)
), probe AS (
  SELECT e.doc_id, e.source,
         (SELECT count(*) FROM UNNEST([
            {', '.join(_bloom_pos_duck(i, 'e.norm') for i in range(_BLOOM_K))}
          ]) AS u(p) JOIN bits b ON b.pos = u.p) = {_BLOOM_K}
           AS bloom_positive,
         EXISTS (SELECT 1 FROM train t WHERE t.norm = e.norm)
           AS exact_dup
  FROM eval_set e
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_probed,
       CAST(sum(bloom_positive::INT) AS BIGINT) AS n_bloom_positive,
       CAST(sum(exact_dup::INT) AS BIGINT) AS n_exact_dup,
       CAST(sum((bloom_positive AND NOT exact_dup)::INT) AS BIGINT)
         AS n_false_positive
FROM probe
GROUP BY source
ORDER BY source
""",
)
def bloom_dedup_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: build a deterministic m-bit,
    k-hash Bloom filter over the train split's normalized texts, probe
    every eval-split document, and report per-source bloom-positive vs
    EXACT duplicate counts — the measured false-positive rate of the
    corpus-admission sketch. The filter is the portable-hash family
    (k independent md5 salts), so the whole audit — including each
    individual false positive — is engine-exact, not statistical.

    Scale shape: the filter is metadata — at most m (=65,536) distinct
    bit positions regardless of corpus size; positions are scan-born
    (explode of k hash exprs), deduped with one map-side-combining
    DISTINCT, and BROADCAST to the probe side. The probe is a
    broadcast join + per-doc count(k hits) — no corpus-sized shuffle.
    Exact membership joins on the md5 fingerprint of the normalized
    text (16 bytes/doc), never the text itself."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", T.norm_text("text").alias("norm")
    )
    # %7 split: coprime with the fixture's source = src{doc_id % 20}
    # assignment, so EVERY source gets probed (a %10 split hit only 2).
    train = docs.filter(F.col("doc_id") % 7 != 0)
    # planted exact duplicates (re-keyed copies of train docs) make
    # the no-false-negative branch LIVE at every fixture — the
    # synthetic corpus has no natural cross-split exact dup. The
    # planted key is -doc_id - 1: natural doc_ids are non-negative,
    # so the planted ids are provably disjoint at ANY corpus size
    # (a fixed +offset would collide once ids reach it — ADVICE r14)
    planted = train.filter(F.col("doc_id") % 97 == 3).select(
        (-F.col("doc_id") - 1).alias("doc_id"), "source", "norm"
    )
    eval_set = docs.filter(F.col("doc_id") % 7 == 0).unionByName(planted)
    pos_arr = "array({})".format(
        ", ".join(
            _bloom_pos_spark(i, "norm") for i in range(_BLOOM_K)
        )
    )
    bits = (
        train.select(F.explode(F.expr(pos_arr)).alias("pos"))
        .distinct()  # bounded by m: metadata-sized at any corpus scale
    )
    probes = eval_set.select(
        "doc_id",
        "source",
        F.md5(F.col("norm").cast("binary")).alias("fp"),
        F.explode(F.expr(pos_arr)).alias("pos"),
    )
    hits = (
        probes.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == _BLOOM_K)
        .select("doc_id", F.lit(True).alias("bloom_positive"))
    )
    train_fp = train.select(
        F.md5(F.col("norm").cast("binary")).alias("fp")
    ).distinct()
    exact = (
        eval_set.select(
            "doc_id", F.md5(F.col("norm").cast("binary")).alias("fp")
        )
        .join(train_fp, "fp", "left_semi")
        .select("doc_id", F.lit(True).alias("exact_dup"))
    )
    flagged = (
        eval_set.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "source",
            F.coalesce("bloom_positive", F.lit(False)).alias("bp"),
            F.coalesce("exact_dup", F.lit(False)).alias("ed"),
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum(F.col("bp").cast("long")).alias("n_bloom_positive"),
            F.sum(F.col("ed").cast("long")).alias("n_exact_dup"),
            F.sum((F.col("bp") & ~F.col("ed")).cast("long")).alias(
                "n_false_positive"
            ),
        )
        .orderBy("source")
    )
