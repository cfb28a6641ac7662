"""Z-order (Morton) clustering — multi-dimensional data skipping.

Range-partitioning a table on ONE key gives tight per-file min/max zone
maps for that key and useless ones for every other column. Interleaving
the bits of two keys into a Morton code and range-partitioning on THAT
gives every file a bounded rectangle in (x, y) space — both columns'
zone maps stay selective, so scans filtered on either dimension (or a
box on both) prune files. This is the layout Delta's OPTIMIZE ZORDER
and Iceberg's sort-order rewrite produce; here it composes with
operators/compaction.py (``sort_cols=[z]``) so the nightly compaction
pass clusters as it rewrites.

The code is a pure column expression (16 unrolled shift/mask terms per
dimension, no UDF) and deterministic, so the assignment itself is
DuckDB-oracle-checkable bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

Z_BITS = 16  # bits kept per dimension; z fits in 32 bits


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: z = Σ_i ((x>>i & 1) << 2i | (y>>i & 1) << 2i+1).
    Callers quantize/clamp dimensions into [0, 2^bits) first."""
    terms = []
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        terms.append(
            F.call_function("shiftleft", xb, F.lit(2 * i)).bitwiseOR(
                F.call_function("shiftleft", yb, F.lit(2 * i + 1))
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def duck_z_value(x: str, y: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of :func:`z_value` (same unrolled expression)."""
    terms = []
    for i in range(bits):
        terms.append(
            f"((({x} >> {i}) & 1) << {2 * i})"
            f" | ((({y} >> {i}) & 1) << {2 * i + 1})"
        )
    return " | ".join(terms)
