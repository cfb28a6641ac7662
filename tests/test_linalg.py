"""Operator-level tests for distributed linear algebra
(operators/linalg.py): GEMM-tier vs expression-tier agreement, trace
identity, covariance diagonal, and power-iteration invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators.linalg import (
    covariance_from_gram,
    expand_symmetric,
    gram_matrix,
    gram_matrix_exact,
    power_iteration,
)
from oracle_vector_search_spark.functions.vector import as_double_array

DIM = 64


class TestGram:
    def test_gemm_matches_expression_tier(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        a = gram_matrix(emb, dim=DIM).select(
            "i", "j", F.round("g", 6).alias("g")
        )
        b = gram_matrix_exact(emb).select(
            "i", "j", F.round("g", 6).alias("g")
        )
        assert a.subtract(b).count() == 0
        assert b.subtract(a).count() == 0

    def test_trace_equals_row_count_for_unit_vectors(self, spark, sf_dir):
        """Fixture embeddings are unit-norm ⇒ trace(Xᵀ@X) = Σ‖x‖² = N."""
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        trace = (
            gram_matrix(emb, dim=DIM)
            .filter(F.col("i") == F.col("j"))
            .agg(F.sum("g"))
            .collect()[0][0]
        )
        assert abs(trace - n) < 1e-3

    def test_row_shape(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        assert gram_matrix(emb, dim=DIM).count() == DIM * (DIM + 1) // 2


class TestCovariance:
    def test_diagonal_is_sample_variance(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        gram = gram_matrix(emb, dim=DIM)
        means = (
            emb.select(
                F.posexplode(as_double_array("embedding")).alias("i", "x")
            )
            .groupBy("i")
            .agg(F.avg("x").alias("mu"))
        )
        cov0 = (
            covariance_from_gram(gram, means, n)
            .filter((F.col("i") == 0) & (F.col("j") == 0))
            .collect()[0]["cov"]
        )
        direct = (
            emb.select(
                F.element_at(as_double_array("embedding"), 1).alias("x0")
            )
            .agg(F.var_samp("x0"))
            .collect()[0][0]
        )
        assert abs(cov0 - direct) < 1e-9

    def test_diagonal_nonnegative(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        gram = gram_matrix(emb, dim=DIM)
        means = (
            emb.select(
                F.posexplode(as_double_array("embedding")).alias("i", "x")
            )
            .groupBy("i")
            .agg(F.avg("x").alias("mu"))
        )
        neg = (
            covariance_from_gram(gram, means, n)
            .filter((F.col("i") == F.col("j")) & (F.col("cov") < 0))
            .count()
        )
        assert neg == 0


class TestPowerIteration:
    def test_result_is_unit_vector(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        gram = gram_matrix(emb, dim=DIM)
        v = power_iteration(gram, dim=DIM, n_iter=3)
        nrm = v.agg(
            F.sqrt(F.sum(F.col("component") * F.col("component")))
        ).collect()[0][0]
        assert abs(nrm - 1.0) < 1e-9
        assert v.count() == DIM

    def test_dominant_axis_on_diagonal_matrix(self, spark):
        """On diag(4, 1, 1) power iteration from uniform v₀ must tilt
        hard toward axis 0 and keep all-positive components."""
        rows = [(0, 0, 4.0), (1, 1, 1.0), (2, 2, 1.0)]
        m = spark.createDataFrame(rows, ["i", "j", "g"])
        v = {
            r["i"]: r["component"]
            for r in power_iteration(m, dim=3, n_iter=5).collect()
        }
        assert v[0] > 0.99
        assert 0 < v[1] < 0.1 and 0 < v[2] < 0.1
        assert abs(v[1] - v[2]) < 1e-12

    def test_expand_symmetric_roundtrip(self, spark):
        upper = spark.createDataFrame(
            [(0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0)], ["i", "j", "g"]
        )
        full = expand_symmetric(upper, "g")
        assert full.count() == 4
        got = {(r["i"], r["j"]): r["g"] for r in full.collect()}
        assert got[(1, 0)] == got[(0, 1)] == 2.0
