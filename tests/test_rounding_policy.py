"""Negative-zero rounding policy (VERDICT r6 #1).

CORRECTNESS_r06's one red row (`embedding_covariance_upper`,
hash_match=False at rows/schema parity) was an IEEE ±0.0 artifact: a
tiny negative (≈ −3e−9) rounds to **−0.0** in DuckDB but **+0.0** in
Spark, and the driver's value hash distinguishes the bit patterns. The
registry-wide policy (functions/rounding.py): every signed rounded
output column gets ``+ 0.0`` appended after the rounding, on BOTH
engines. These tests pin the mechanism; tools/oracle_check.py enforces
the policy over the full surface (it hard-fails any −0.0 in either
engine's output AND any cross-engine zero-sign disagreement).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from oracle_vector_search_spark.functions.rounding import round_signed


def _is_neg_zero(x: float) -> bool:
    return x == 0.0 and math.copysign(1.0, x) < 0


def test_duckdb_round_emits_negative_zero():
    """The hazard this policy exists for: DuckDB's round() preserves
    the sign of a tiny negative as −0.0 (if this ever changes the
    policy becomes a harmless no-op, but the test documents why)."""
    (v,) = duckdb.sql("SELECT round(-3e-9, 6)").fetchone()
    assert _is_neg_zero(v)
    (v,) = duckdb.sql("SELECT round(-3e-9, 6) + 0.0").fetchone()
    assert v == 0.0 and not _is_neg_zero(v)


def test_spark_round_vs_round_signed(spark):
    rows = (
        spark.range(1)
        .select(
            F.round(F.lit(-3e-9), 6).alias("plain"),
            round_signed(F.lit(-3e-9)).alias("signed"),
            round_signed(F.lit(-1.25)).alias("neg"),
            round_signed(F.lit(1.25)).alias("pos"),
            round_signed(F.lit(0.0)).alias("zero"),
        )
        .collect()
    )
    r = rows[0]
    # normalization is the identity away from zero ...
    assert r["neg"] == -1.25 and r["pos"] == 1.25 and r["zero"] == 0.0
    # ... and never emits -0.0 at zero
    assert not _is_neg_zero(r["signed"])
    assert not _is_neg_zero(r["zero"])


@pytest.mark.parametrize(
    "val", [-3e-9, -1e-12, -4.9e-7, 0.0, -0.0, 2.5e-9]
)
def test_engines_agree_after_normalization(spark, val):
    """Cross-engine sign-of-zero agreement for values that round to
    zero at 6 decimals — exactly the class that flipped the r6 driver
    hash."""
    (dv,) = duckdb.sql(f"SELECT round({val!r}, 6) + 0.0").fetchone()
    sv = (
        spark.range(1)
        .select(round_signed(F.lit(float(val))).alias("v"))
        .collect()[0]["v"]
    )
    assert math.copysign(1.0, dv) == math.copysign(1.0, sv)
    assert dv == sv


def test_oracle_check_flags_zero_sign_mismatch():
    """The local gate must detect what the driver detects: −0.0 on one
    side vs +0.0 on the other is a HARD failure even though the values
    compare numerically equal (oracle_check previously normalized this
    away, masking the r6 red row)."""
    import os
    import sys

    import pandas as pd

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    import oracle_check as oc

    a = pd.DataFrame({"k": [1], "v": [0.0]})
    b = pd.DataFrame({"k": [1], "v": [-0.0]})
    issues = [
        i for i in oc.compare("t", a, b) if not i.startswith("dtype note")
    ]
    assert issues, "zero-sign mismatch must be flagged"
    assert any("negative-zero" in i or "-0.0" in i for i in issues)
    # and a -0.0 present on BOTH sides is still a policy violation
    issues_same = [
        i
        for i in oc.compare("t", b.copy(), b.copy())
        if not i.startswith("dtype note")
    ]
    assert any("policy violation" in i for i in issues_same)
