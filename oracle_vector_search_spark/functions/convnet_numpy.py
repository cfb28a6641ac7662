"""Fixed-weight convolutional embedder, pure numpy — the THIRD
embedder tier (VERDICT r8 #7).

The torch tier (`sources.images._torch_embed_batch`, the reference's
ResNet-18 path, build_faiss_db.py:109-134) can never run in a
torch-less CI, so its load-bearing code shapes — per-executor weight
cache, decode → shape-group → ONE stacked NCHW forward per distinct
shape, None-for-undecodable (F3) — were untested.  This module is a
real conv/pool/normalize forward pass with DETERMINISTIC hash-derived
weights, so the exact same batching machinery runs ungated and
golden-checked:

    normalize (ImageNet mean/std, float32)
    → conv 3×3 (8 filters) + bias, ReLU
    → 2×2 max pool, stride 2
    → conv 3×3 (``dims`` filters) + bias, ReLU
    → global average pool → L2 normalize

Weights come from MD5 digests of a fixed seed string (zero-mean
scaled int8 lattice over the digest bytes), so every executor derives
bit-identical filters with no weight file and no RNG.  All arithmetic
is float32 with every reduction written as an explicit in-order
accumulate (no einsum/BLAS, whose float32 blocking order is not
contractually fixed) — embeddings are bit-stable across platforms and
batch compositions (each image's forward never mixes with its
neighbors').
"""

from __future__ import annotations

import hashlib

import numpy as np

_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_F1 = 8  # first-layer filters

#: per-process (hence per-executor) weight cache, keyed by dims —
#: the same cache discipline as the torch tier's model singleton
_WEIGHT_CACHE: dict[int, tuple] = {}


def _hash_floats(tag: str, n: int) -> np.ndarray:
    """n deterministic floats in [-0.5, 0.5): MD5(tag:i) bytes → int8
    lattice / 256.  No RNG, no platform dependence."""
    out = np.empty(n, dtype=np.float32)
    pos = 0
    i = 0
    while pos < n:
        d = hashlib.md5(f"ovs-convnet:{tag}:{i}".encode()).digest()
        block = (
            np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 127.5
        ) / 256.0
        take = min(16, n - pos)
        out[pos:pos + take] = block[:take]
        pos += take
        i += 1
    return out


def convnet_weights(dims: int):
    """(w1, b1, w2, b2): conv1 (F1, 3, 3, 3), conv2 (dims, F1, 3, 3),
    hash-derived, cached per process."""
    cached = _WEIGHT_CACHE.get(dims)
    if cached is not None:
        return cached
    w1 = _hash_floats("w1", _F1 * 3 * 3 * 3).reshape(_F1, 3, 3, 3)
    b1 = _hash_floats("b1", _F1)
    w2 = _hash_floats(f"w2:{dims}", dims * _F1 * 3 * 3).reshape(
        dims, _F1, 3, 3
    )
    b2 = _hash_floats(f"b2:{dims}", dims)
    _WEIGHT_CACHE[dims] = (w1, b1, w2, b2)
    return w1, b1, w2, b2


def _conv3x3(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Valid 3×3 convolution, NCHW float32: nine shifted
    multiply-accumulates in a FIXED (dy, dx, cin) order so the float32
    sum is associativity-stable."""
    n, cin, h, wd = x.shape
    cout = w.shape[0]
    oh, ow = h - 2, wd - 2
    out = np.broadcast_to(
        b.reshape(1, cout, 1, 1), (n, cout, oh, ow)
    ).astype(np.float32).copy()
    for dy in range(3):
        for dx in range(3):
            patch = x[:, :, dy:dy + oh, dx:dx + ow]
            # channel reduction as explicit in-order += (not einsum,
            # whose float32 blocking/accumulation order is not
            # contractually fixed across numpy/BLAS builds — ADVICE r9)
            for c in range(cin):
                out += (
                    patch[:, c][:, None]
                    * w[None, :, c, dy, dx, None, None]
                )
    return out


def _maxpool2(x: np.ndarray) -> np.ndarray:
    n, c, h, w = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, :, : h2 * 2, : w2 * 2]
    return x.reshape(n, c, h2, 2, w2, 2).max(axis=(3, 5))


def convnet_forward(batch_nhwc: np.ndarray, dims: int) -> np.ndarray:
    """(N, H, W, 3) uint8 → (N, dims) float32 L2-normalized embeddings.
    H and W must be ≥ 8: conv1 eats 2, the 2× pool floors, conv2
    needs 3 — (side − 2) // 2 ≥ 3."""
    w1, b1, w2, b2 = convnet_weights(dims)
    x = batch_nhwc.astype(np.float32) / np.float32(255.0)
    x = (x - _MEAN) / _STD
    x = np.ascontiguousarray(x.transpose(0, 3, 1, 2))  # NCHW
    x = np.maximum(_conv3x3(x, w1, b1), np.float32(0.0))
    x = _maxpool2(x)
    x = np.maximum(_conv3x3(x, w2, b2), np.float32(0.0))
    feat = x.mean(axis=(2, 3), dtype=np.float32)
    nrm = np.sqrt((feat * feat).sum(axis=1, dtype=np.float32))
    nrm = np.where(nrm == 0, np.float32(1.0), nrm)
    return feat / nrm[:, None]


def convnet_embed_batch(
    arrays: list, dims: int = 8
) -> list:
    """Shape-grouped batch embed over decoded (H, W, 3) uint8 arrays —
    the SAME grouping contract as the torch tier: one stacked forward
    per distinct shape, ``None`` rows pass through as None (F3), rows
    too small for the receptive field (min side < 8) embed as None."""
    out: list = [None] * len(arrays)
    groups: dict[tuple, list[int]] = {}
    for i, a in enumerate(arrays):
        if a is not None and a.size and min(a.shape[0], a.shape[1]) >= 8:
            groups.setdefault(a.shape, []).append(i)
    for idxs in groups.values():
        stacked = np.stack([arrays[i] for i in idxs])
        emb = convnet_forward(stacked, dims)
        for row, i in zip(emb, idxs):
            out[i] = [float(v) for v in row]
    return out
