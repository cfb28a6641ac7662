"""Property tests for the vector kernel library (SURVEY.md §5.3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.functions.vector import (
    as_double_array,
    cosine_similarity,
    dot,
    euclidean,
    l2_norm,
    l2_normalize,
)
from oracle_vector_search_spark.io import load_table


def _one(df, col):
    return df.select(col.alias("x")).first()["x"]


def test_dot_simple(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    assert _one(df, dot("a", "b")) == pytest.approx(32.0)


def test_l2_norm_and_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    assert _one(df, l2_norm("a")) == pytest.approx(5.0)
    unit = _one(df, l2_normalize("a"))
    assert unit == pytest.approx([0.6, 0.8])


def test_self_cosine_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    v = as_double_array("embedding")
    rows = emb.select(F.round(cosine_similarity(v, v), 9).alias("c")).collect()
    assert rows and all(abs(r["c"] - 1.0) < 1e-6 for r in rows)


def test_cosine_bounds(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.limit(20).select(
        F.col("vec_id").alias("ida"), as_double_array("embedding").alias("va")
    )
    b = emb.limit(20).select(
        F.col("vec_id").alias("idb"), as_double_array("embedding").alias("vb")
    )
    mx, mn = (
        a.crossJoin(b)
        .select(cosine_similarity("va", "vb").alias("c"))
        .agg(F.max("c"), F.min("c"))
        .first()
    )
    assert mx <= 1.0 + 1e-9 and mn >= -1.0 - 1e-9


def test_euclidean(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [3.0, 4.0])], "a array<double>, b array<double>"
    )
    assert _one(df, euclidean("a", "b")) == pytest.approx(5.0)


def test_normalize_zero_vector_yields_null_elements(spark):
    df = spark.createDataFrame([([0.0, 0.0],)], "a array<double>")
    unit = _one(df, l2_normalize("a"))
    assert all(u is None for u in unit)
