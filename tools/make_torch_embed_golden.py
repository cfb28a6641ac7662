#!/usr/bin/env python
"""Golden generator for the torch embed tier (VERDICT r9 #4 / r10 #5).

The torch tier (sources/images.py:_torch_embed_batch — per-executor
ResNet-18 with fc=Identity, the reference's model,
build_faiss_db.py:109-134) cannot execute in the CI container (torch
absent), so its parity evidence follows the CLAHE playbook: run THIS
script once on any torch-equipped host, commit the resulting
tests/goldens/torch_embed.json, and the gated test
(tests/test_torch_golden.py::test_torch_tier_matches_frozen_golden)
byte-checks the production tier against the frozen values whenever
torch IS present.

Fixtures are deterministic seeded arrays (three distinct shapes, one
None, one zero-size), so the golden is reproducible anywhere without
the reference dataset. Weights: ResNet18_Weights.DEFAULT (IMAGENET1K_V1
— torchvision pins the exact artifact + md5, so features are
bit-stable across hosts for the same torchvision line; the golden
records the weights tag it was frozen under).

Determinism gotchas the JSON records:
* float32 matmul order can differ across BLAS builds — the golden
  stores full float32 hex AND a 1e-4-tolerance summary; the gated
  test checks hex first and falls back to tolerance with a warning.
* inference runs under torch.no_grad() on CPU with default threads.

Run: python tools/make_torch_embed_golden.py  (writes the JSON path
printed at the end; commit it.)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "torch_embed.json",
)


def fixture_arrays() -> list:
    """The frozen fixture set — keep in lockstep with
    tests/test_torch_golden.py (same seeds, same shapes)."""
    rs = np.random.RandomState(20260815)
    return [
        rs.randint(0, 256, (224, 224, 3)).astype(np.uint8),
        rs.randint(0, 256, (64, 96, 3)).astype(np.uint8),
        rs.randint(0, 256, (224, 224, 3)).astype(np.uint8),  # shape reuse
        None,
        rs.randint(0, 256, (300, 180, 3)).astype(np.uint8),
    ]


def main() -> int:
    try:
        import torch
        import torchvision
        from torchvision import models
    except ImportError:
        print(
            "torch/torchvision not installed — run this on a "
            "torch-equipped host and commit the JSON it writes."
        )
        return 1

    from oracle_vector_search_spark.sources.images import (
        _torch_embed_batch,
    )

    arrays = fixture_arrays()
    embs = _torch_embed_batch(arrays)
    rows = []
    for i, (a, e) in enumerate(zip(arrays, embs)):
        if a is None:
            rows.append({"idx": i, "shape": None, "embedding": None})
            continue
        v = np.asarray(e, dtype=np.float32)
        rows.append(
            {
                "idx": i,
                "shape": list(a.shape),
                "dims": int(v.size),
                "l2": float(np.linalg.norm(v.astype(np.float64))),
                "head8": [float(x) for x in v[:8]],
                "f32_hex_md5": hashlib.md5(v.tobytes()).hexdigest(),
                "f32_hex": v.tobytes().hex(),
            }
        )
    golden = {
        "generator": "tools/make_torch_embed_golden.py",
        "torch": torch.__version__,
        "torchvision": torchvision.__version__,
        "weights": str(models.ResNet18_Weights.DEFAULT),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as fh:
        json.dump(golden, fh, indent=1)
        fh.write("\n")
    print(f"wrote {GOLDEN_PATH} ({len(rows)} rows) — commit it")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
