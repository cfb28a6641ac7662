"""Scale-path operators: salted join equivalence, bucketed co-located
join (no shuffle in the plan), index-table write round-trip."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.ingest import write_index_table
from oracle_vector_search_spark.operators.skew import (
    profile_guided_salted_join,
    salted_join,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_linenumber"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", salt_buckets=8,
                         salt_on="l_linenumber")
    key = lambda r: (r["l_orderkey"], r["l_linenumber"])
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, salted.collect())
    )
    assert plain.count() == salted.count()


def test_salted_join_deterministic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(500)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    a = salted_join(li, orders, "l_orderkey", salt_on="l_linenumber").count()
    b = salted_join(
        li.repartition(13), orders, "l_orderkey", salt_on="l_linenumber"
    ).count()
    assert a == b


def test_profile_guided_join_equals_plain_join(spark, sf_dir):
    """Hot keys routed through the salted path + cold keys through the
    plain path must reproduce the plain join exactly (events.user_id is
    the deliberately-skewed fixture key)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey"
    )
    plain = ev.join(orders, "user_id")
    guided = profile_guided_salted_join(
        ev, orders, "user_id", top_n=10, skew_mult=1.5, salt_on="event_id"
    )
    key = lambda r: (r["user_id"], r["event_id"], r["o_orderkey"])
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, guided.collect())
    )


def test_profile_guided_join_no_hot_keys_fast_path(spark, sf_dir):
    """An impossible skew threshold detects nothing hot — the operator
    must degrade to the plain join, not an empty hot branch."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey"
    )
    guided = profile_guided_salted_join(
        ev, orders, "user_id", skew_mult=1e12, salt_on="event_id"
    )
    assert guided.count() == ev.join(orders, "user_id").count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """bucketBy co-location: a join on the bucket key plans without an
    Exchange on either side — the 100 TB repeated-join layout."""
    # uses the default warehouse dir (static conf); tables dropped below
    if True:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("li_b")
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("ord_b")
        j = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # disable broadcast so the co-located sort-merge path is chosen
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = j._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024),
            )
        assert "Exchange" not in plan, plan
        assert j.count() > 0
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_query_plan(spark, sf_dir):
    """The registered bucketed query joins catalog-bucketed tables:
    SortMergeJoin with zero Exchange on either side."""
    from oracle_vector_search_spark.queries.scale_queries import (
        _bucketed_tables,
    )

    ord_t, li_t = _bucketed_tables(spark, sf_dir)
    li, o = spark.table(li_t), spark.table(ord_t)
    j = li.hint("merge").join(o, li["l_orderkey"] == o["o_orderkey"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """The Bloom probe may keep extra rows (false positives) but must
    never drop a true match, and it must actually be selective."""
    from oracle_vector_search_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom,
    )

    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    words = build_bloom(urgent, "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    kept = li.filter(bloom_might_contain(F.col("l_orderkey"), words))
    n_true = li.join(
        urgent, li["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    ).count()
    n_kept_true = kept.join(
        urgent, kept["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    ).count()
    assert n_kept_true == n_true  # no false negatives, ever
    total, n_kept = li.count(), kept.count()
    # ~20% of orders are urgent; the probe should reject most others
    assert n_kept < total * 0.5, (n_kept, total)


def test_posting_table_prunes_term_buckets(spark, sf_dir):
    """The at-rest inverted index partitions by a driver-computable
    term bucket: a known-term read prunes at the metadata level
    (PartitionFilters), not with a post-scan filter."""
    from oracle_vector_search_spark.queries.training_queries import (
        _posting_tables,
        term_bucket,
    )

    postings, stats = _posting_tables(spark, sf_dir)
    b = term_bucket("vector")
    scan = postings.filter(F.col("tb") == b)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(tb" in plan, plan
    # dl denormalization is consistent: one doc length per doc_id
    bad = (
        postings.groupBy("doc_id")
        .agg(F.countDistinct("dl").alias("n"))
        .filter("n != 1")
        .count()
    )
    assert bad == 0
    assert stats.count() == 1


def test_merge_upsert_semantics(spark):
    from oracle_vector_search_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        "k long, ver long, v string",
    )
    updates = spark.createDataFrame(
        [(2, 25, "b2"), (3, 30, "c-tie"), (4, 5, "d")],
        "k long, ver long, v string",
    )
    got = {
        r["k"]: (r["ver"], r["v"])
        for r in merge_upsert(base, updates, ["k"], ["ver"]).collect()
    }
    assert got == {
        1: (10, "a"),       # untouched base row survives
        2: (25, "b2"),      # newer update wins
        3: (30, "c-tie"),   # exact version tie -> updates side wins
        4: (5, "d"),        # brand-new key inserted
    }


def test_write_index_table_roundtrip(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, "train")
        .otherwise("valid")
        .alias("split"),
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/index_table"
        write_index_table(emb, path)
        back = spark.read.parquet(path)
        assert back.count() == emb.count()
        assert set(back.columns) == {"id", "embedding", "split"}
        # split partitioning prunes files for split-scoped scans
        train_only = back.filter(F.col("split") == "train")
        assert train_only.count() == emb.filter("id % 2 = 0").count()


def test_approx_aggregates_error_bounds(spark, sf_dir):
    """The query now carries its own error audit (r5): exact columns
    plus sketch-within-bounds flags. Verify the exact side against an
    independent computation and that every bound flag holds."""
    from oracle_vector_search_spark.queries.relational2_queries import (
        approx_aggregates,
    )

    rows = {
        r["l_returnflag"]: r
        for r in approx_aggregates(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_orderkey").alias("orders"),
            F.percentile(
                F.floor(F.col("l_extendedprice") * 100).cast("long"),
                F.lit(0.5),
            ).alias("median_cents"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for k, e in exact.items():
        a = rows[k]
        assert a["exact_parts"] == e["parts"]
        assert a["exact_orders"] == e["orders"]
        assert a["exact_median"] == round(e["median_cents"] / 100.0, 6)
        assert a["parts_within_15pct"] is True
        assert a["orders_within_15pct"] is True
        assert a["median_within_2pct"] is True


def test_chunking_invariants(spark):
    from oracle_vector_search_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )

    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "short doc")],
                               "doc_id long, text string")
    chunks = chunk_documents(df, chunk_size=40, overlap=10).collect()
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    d1 = sorted(by_doc[1], key=lambda c: c["chunk_idx"])
    # stride 30 with overlap 10: starts 1,31,61 — chunk 3 reaches token
    # 100, so no tail chunk is needed (starts stop at n - overlap)
    assert [c["n_tokens"] for c in d1] == [40, 40, 40]
    # consecutive chunks overlap by exactly 10 tokens
    for a, b in zip(d1, d1[1:]):
        ta, tb = a["chunk_text"].split(" "), b["chunk_text"].split(" ")
        assert ta[-10:] == tb[:10] or len(tb) < 10
    # every token covered exactly: strided reconstruction
    recon = d1[0]["chunk_text"].split(" ")
    for c in d1[1:]:
        recon += c["chunk_text"].split(" ")[10:]
    assert recon == [f"w{i}" for i in range(100)]
    # short doc → one chunk with all tokens
    assert [c["n_tokens"] for c in by_doc[2]] == [2]

    from oracle_vector_search_spark.operators.chunking import SHARD_STRIDE

    binned = pack_chunks(
        chunk_documents(df, chunk_size=40, overlap=10), window_tokens=50
    ).collect()
    # bin ids decompose as shard * 2^40 + local_bin; local bins are
    # dense from 0 within each shard, and docs shard by pmod(doc_id)
    shards = {}
    for r in binned:
        shard, local = divmod(r["bin_id"], SHARD_STRIDE)
        shards.setdefault(shard, set()).add(local)
        assert shard == r["doc_id"] % 32
    for local_ids in shards.values():
        assert sorted(local_ids) == list(range(len(local_ids)))
    assert len(shards) == 2  # doc 1 and doc 2 land in different shards


def test_greedy_packing_respects_budget(spark, sf_dir):
    from oracle_vector_search_spark.operators.chunking import (
        chunk_documents,
        pack_chunks_greedy,
    )

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200")
    chunks = chunk_documents(docs, chunk_size=40, overlap=10)
    packed = pack_chunks_greedy(chunks, window_tokens=100).collect()
    by_bin = {}
    for r in packed:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for bin_id, rows in by_bin.items():
        total = sum(r["n_tokens"] for r in rows)
        # budget holds unless the bin is a single oversized chunk
        assert total <= 100 or len(rows) == 1, (bin_id, total)
        # bins never span shards
        assert len({r["doc_id"] % 32 for r in rows}) == 1
    # local bin ids dense from 0 within each shard
    from oracle_vector_search_spark.operators.chunking import SHARD_STRIDE

    by_shard = {}
    for bin_id in by_bin:
        shard, local = divmod(bin_id, SHARD_STRIDE)
        by_shard.setdefault(shard, set()).add(local)
    for locals_ in by_shard.values():
        assert sorted(locals_) == list(range(len(locals_)))
    # deterministic under repartition
    again = pack_chunks_greedy(
        chunk_documents(docs.repartition(7), 40, 10), window_tokens=100
    ).collect()
    key = lambda r: (r["doc_id"], r["chunk_idx"], r["bin_id"])
    assert sorted(map(key, packed)) == sorted(map(key, again))


def test_two_phase_ids_match_window_tier(spark, sf_dir):
    from pyspark.sql import functions as F

    from oracle_vector_search_spark.operators.ingest import (
        assign_index_ids,
        assign_index_ids_two_phase,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    a = assign_index_ids(docs, ["doc_id"]).select("doc_id", "id")
    b = assign_index_ids_two_phase(
        docs.repartition(11), ["doc_id"], num_partitions=7
    ).select("doc_id", "id")
    assert a.collect() and sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )
    # ids are dense 1..N
    n = docs.count()
    got = sorted(r["id"] for r in b.collect())
    assert got == list(range(1, n + 1))
    # no global single-task exchange in the two-phase plan
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_ntile_scaled_matches_exact_tier(spark, sf_dir):
    from oracle_vector_search_spark.queries.relational2_queries import (
        ntile_distribution,
        ntile_distribution_scaled,
    )

    exact = ntile_distribution(spark, sf_dir).collect()
    scaled = ntile_distribution_scaled(spark, sf_dir).collect()
    key = lambda r: r["c_custkey"]
    assert sorted(map(tuple, exact), key=lambda t: t[0]) == sorted(
        map(tuple, scaled), key=lambda t: t[0]
    )
    # the scale tier must not move the payload through one task
    plan = (
        ntile_distribution_scaled(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
