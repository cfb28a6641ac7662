"""Pluggable embedders (SURVEY.md §2.3 T8).

The reference embeds crops with ResNet-18 (fc=Identity → 512-d float,
/root/reference/build_faiss_db.py:109-134). Torch isn't in the engine's
core deps, so the DEFAULT embedder is a deterministic hash-projection:

    e_i = hash28(md5_hex(content) + ':' + i) / 2^27 - 1   ∈ [-1, 1)
    v   = e / ‖e‖₂

It is (a) fully deterministic, (b) expressible as pure SQL in BOTH
Spark and DuckDB (oracle-checkable end-to-end through the whole build
pipeline), and (c) shaped exactly like a real embedder (fixed-D float
vector per content blob) so swapping in torch (sources/images.py) does
not change any downstream operator.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEFAULT_DIMS = 8
_SCALE = float(1 << 27)  # hash28 range is [0, 2^28) → /2^27 - 1 ∈ [-1, 1)


def _spark_component(md5_expr: str, i: int) -> str:
    # NB: a bare literal like 134217728.0 parses as DECIMAL in Spark SQL
    # (decimal division would diverge from DuckDB's double math) — force
    # DOUBLE with the D suffix.
    h = f"cast(conv(substr(md5(concat({md5_expr}, ':', '{i}')), 1, 7), 16, 10) as bigint)"
    return f"({h} / {_SCALE}D - 1.0D)"


def spark_embedding_expr(md5_expr: str, dims: int = DEFAULT_DIMS) -> str:
    """Spark SQL fragment: raw (unnormalized) embedding array."""
    comps = ", ".join(_spark_component(md5_expr, i) for i in range(dims))
    return f"array({comps})"


def _duck_component(md5_expr: str, i: int) -> str:
    h = f"CAST(('0x' || substr(md5({md5_expr} || ':' || '{i}'), 1, 7)) AS BIGINT)"
    return f"({h} / {_SCALE} - 1.0)"


def duck_embedding_expr(md5_expr: str, dims: int = DEFAULT_DIMS) -> str:
    comps = ", ".join(_duck_component(md5_expr, i) for i in range(dims))
    return f"[{comps}]"


def hash_projection_embed_numpy(content: bytes, dims: int = DEFAULT_DIMS):
    """Numpy twin of the SQL embedder (used by the pandas-UDF image
    pipeline); identical output to the SQL fragments above."""
    import hashlib

    import numpy as np

    md5_hex = hashlib.md5(content).hexdigest()
    vals = []
    for i in range(dims):
        h = int(hashlib.md5(f"{md5_hex}:{i}".encode()).hexdigest()[:7], 16)
        vals.append(h / _SCALE - 1.0)
    v = np.asarray(vals, dtype=np.float64)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def hash_projection_embed_batch(
    contents, dims: int = DEFAULT_DIMS
) -> list[list[float] | None]:
    """Batch form for Arrow-batched UDFs: embeds a whole sequence of
    blobs at once. Per-blob md5 stays (it's C code), but the scale /
    normalize arithmetic runs as one stacked numpy op per batch, and
    duplicate blobs — common in crop pipelines and dedup corpora —
    are embedded once per batch. None in → None out."""
    import hashlib

    import numpy as np

    md5s = [
        hashlib.md5(b).hexdigest() if b is not None else None
        for b in contents
    ]
    uniq = sorted({m for m in md5s if m is not None})
    if not uniq:
        return [None] * len(md5s)
    H = np.empty((len(uniq), dims), dtype=np.float64)
    for r, m in enumerate(uniq):
        for i in range(dims):
            H[r, i] = int(
                hashlib.md5(f"{m}:{i}".encode()).hexdigest()[:7], 16
            )
    V = H / _SCALE - 1.0
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    V /= np.where(norms > 0, norms, 1.0)
    lookup = {m: V[r].tolist() for r, m in enumerate(uniq)}
    return [lookup[m] if m is not None else None for m in md5s]
