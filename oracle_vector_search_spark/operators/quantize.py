"""Product quantization (PQ) with deterministic hash-derived codebooks.

The compression layer of a 100 TB vector index (the FAISS IVFPQ idea):
split each D-dim vector into M subvectors, replace each subvector with
the id of its nearest codebook centroid — D floats become M small ints
(here 64×8B → 8 codes, a 64x size cut), and search scores against the
reconstruction (asymmetric distance).

Real PQ trains codebooks with k-means; the engine's codebooks are
hash-derived (``c[s][k][d] = hash28('pq:s:k:d')/2^27 - 1``, same
portable md5 family as operators.ann planes), which makes encoding,
reconstruction, and PQ search IDENTICAL in Spark and DuckDB — the
whole compression path is oracle-checked, not just property-tested. A
trained codebook drops into the same literal-array shape.

Scale notes: encoding is a pure per-row projection (rides the scan);
PQ search is the same broadcast-query / stream-index plan as exact kNN
with the index side 64x smaller at rest.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

PQ_SUBSPACES = 8  # M
PQ_SUBDIM = 8  # D / M for the 64-d fixture
PQ_K = 16  # centroids per subspace (4-bit codes)
_SCALE = float(1 << 27)


def pq_centroid(s: int, k: int) -> list[float]:
    """Centroid k of subspace s — deterministic, engine-portable."""
    out = []
    for d in range(PQ_SUBDIM):
        h = int(
            hashlib.md5(f"pq:{s}:{k}:{d}".encode()).hexdigest()[:7], 16
        )
        out.append(h / _SCALE - 1.0)
    return out


def _sub(vec_col: str, s: int) -> Column:
    return F.slice(F.col(vec_col), s * PQ_SUBDIM + 1, PQ_SUBDIM)


def _codebook(s: int) -> Column:
    return F.array(
        *[
            F.array(*[F.lit(v) for v in pq_centroid(s, k)])
            for k in range(PQ_K)
        ]
    )


def _sq_dist(a: Column, c) -> Column:
    # left-fold sum, matching the DuckDB twin's explicit left-assoc sum
    return F.aggregate(
        F.zip_with(a, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, e, code0..code{M-1}, recon) — nearest-centroid code per
    subspace (ties → lowest k via first-match array_position) and the
    reconstructed vector (centroid concatenation)."""
    d = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("e")
    )

    def _dist_fn(s: int):
        # NB: a closure factory, NOT `lambda c, s=s:` — pyspark gives a
        # two-parameter lambda the ELEMENT INDEX as its second argument,
        # which would silently rebind s
        return lambda c: _sq_dist(_sub("e", s), c)

    codes = []
    recon_parts = []
    for s in range(PQ_SUBSPACES):
        cents = _codebook(s)
        dists = F.transform(cents, _dist_fn(s))
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast(
            "int"
        )
        codes.append(code.alias(f"code{s}"))
        recon_parts.append(
            F.element_at(_codebook(s), F.col(f"code{s}") + 1)
        )
    d = d.select(F.col(id_col), F.col("e"), *codes)
    return d.withColumn("recon", F.flatten(F.array(*recon_parts)))


# ----------------------------------------------------------- DuckDB twins
# NB every float literal gets ::DOUBLE — DuckDB (like Spark) parses
# bare decimal literals as DECIMAL, and decimal distance math diverges
# from the double math Spark runs.
def duck_centroid_sql(s: int, k: int) -> str:
    return (
        "["
        + ", ".join(f"{v!r}::DOUBLE" for v in pq_centroid(s, k))
        + "]"
    )


def duck_codebook_sql(s: int) -> str:
    return (
        "[" + ", ".join(duck_centroid_sql(s, k) for k in range(PQ_K)) + "]"
    )


def duck_dist_sql(e: str, s: int, k: int) -> str:
    """Explicit left-assoc term sum — identical fold order to Spark's
    aggregate, so the doubles match bit-for-bit."""
    c = pq_centroid(s, k)
    terms = [
        f"({e}[{s * PQ_SUBDIM + d + 1}] - {c[d]!r}::DOUBLE)"
        f" * ({e}[{s * PQ_SUBDIM + d + 1}] - {c[d]!r}::DOUBLE)"
        for d in range(PQ_SUBDIM)
    ]
    out = "(0.0::DOUBLE + " + terms[0] + ")"
    for t in terms[1:]:
        out = "(" + out + " + " + t + ")"
    return out


def duck_code_sql(e: str, s: int) -> str:
    dists = "[" + ", ".join(
        duck_dist_sql(e, s, k) for k in range(PQ_K)
    ) + "]"
    return (
        f"CAST(list_position({dists}, list_min({dists})) - 1 AS INTEGER)"
    )


def duck_recon_sql(code_cols: list[str]) -> str:
    """Reconstruction from code columns (one per subspace)."""
    parts = [
        f"{duck_codebook_sql(s)}[{code_cols[s]} + 1]"
        for s in range(PQ_SUBSPACES)
    ]
    return "flatten([" + ", ".join(parts) + "])"
