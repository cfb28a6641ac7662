"""Hypothesis property tests for the numpy-side kernels (no Spark —
fast, wide input coverage)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from oracle_vector_search_spark.functions.embed import (
    hash_projection_embed_numpy,
)
from oracle_vector_search_spark.operators.ann import plane_values
from oracle_vector_search_spark.sources.images import _blur3, _gamma_lut
from oracle_vector_search_spark.sources.media import (
    _decode_audio,
    _decode_video,
    encode_fake_audio,
    encode_fake_video,
)


@given(st.binary(min_size=0, max_size=256))
@settings(max_examples=200, deadline=None)
def test_embedder_unit_norm_and_deterministic(content):
    a = hash_projection_embed_numpy(content, dims=8)
    b = hash_projection_embed_numpy(content, dims=8)
    assert np.array_equal(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9


@given(st.integers(min_value=0, max_value=15), st.integers(2, 128))
@settings(max_examples=50, deadline=None)
def test_plane_values_bounded_and_stable(j, dims):
    p = plane_values(j, dims)
    assert len(p) == dims
    assert all(-1.0 <= x < 1.0 for x in p)
    assert p == plane_values(j, dims)


@given(st.floats(min_value=0.2, max_value=5.0))
@settings(max_examples=50, deadline=None)
def test_gamma_lut_monotone(gamma):
    lut = _gamma_lut(gamma)
    assert lut[0] == 0 and lut[255] == 255
    assert (np.diff(lut.astype(int)) >= 0).all()


@given(st.integers(3, 16), st.integers(3, 16), st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_blur_range_preserving(h, w, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = _blur3(arr)
    assert out.shape == arr.shape
    assert out.min() >= arr.min() - 1 and out.max() <= arr.max() + 1


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_media_decoders_never_raise(garbage):
    # permissive decode contract: arbitrary bytes → None or valid array
    v = _decode_video(garbage)
    assert v is None or v.ndim == 3
    a = _decode_audio(garbage)
    assert a is None or (isinstance(a[0], int) and a[1].ndim == 1)


@given(
    st.integers(1, 5),
    st.integers(1, 8),
    st.integers(1, 8),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_video_roundtrip(n, h, w, seed):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, (n, h, w), dtype=np.uint8)
    back = _decode_video(encode_fake_video(frames))
    assert np.array_equal(back, frames)


@given(st.integers(1, 1000), st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_audio_roundtrip(n, seed):
    rng = np.random.RandomState(seed)
    x = rng.randint(-32768, 32767, n).astype(np.int16)
    sr, back = _decode_audio(encode_fake_audio(x, 16000))
    assert sr == 16000
    assert np.array_equal(back, x)


# ---- round-5 additions: pure-python mirrors of the new algorithms ----


def _skyline_runmax(points):
    """The sort-order running-max skyline formulation (the algorithm
    both the Spark two-stage query and the DuckDB oracle encode)."""
    pts = sorted(set(points), key=lambda p: (-p[0], -p[1]))
    out, prev_max = [], None
    for price, date in pts:
        if prev_max is None or prev_max < date:
            out.append((price, date))
        prev_max = date if prev_max is None else max(prev_max, date)
    return set(out)


def _skyline_brute(points):
    pts = set(points)
    return {
        b
        for b in pts
        if not any(
            a != b and a[0] >= b[0] and a[1] >= b[1] for a in pts
        )
    }


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50), st.integers(0, 50)
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_skyline_formulation_matches_bruteforce(points):
    assert _skyline_runmax(points) == _skyline_brute(points)


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 7),
)
@settings(max_examples=100, deadline=None)
def test_skyline_decomposable(points, n_buckets):
    """skyline(S) == skyline(∪ skyline(buckets)) — the property the
    two-stage Spark plan relies on, for ANY bucketing of the input."""
    pts = list(set(points))
    buckets = [pts[i::n_buckets] for i in range(n_buckets)]
    survivors = set()
    for b in buckets:
        if b:
            survivors |= _skyline_runmax(b)
    assert _skyline_runmax(list(survivors)) == _skyline_brute(pts)


@given(
    st.integers(1, 40),
    st.integers(1, 6),
    st.integers(0, 2**32 - 1),
    st.integers(1, 5),
)
@settings(max_examples=100, deadline=None)
def test_gram_batch_partials_sum_to_whole(n, d, seed, n_batches):
    """Σ_batches Xᵇᵀ@Xᵇ == Xᵀ@X for any row split — the map-side-
    combine identity operators.linalg.gram_matrix relies on."""
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d)
    whole = X.T @ X
    acc = np.zeros((d, d))
    for b in range(n_batches):
        part = X[b::n_batches]
        if len(part):
            acc += part.T @ part
    assert np.allclose(acc, whole, atol=1e-9)


@given(st.integers(2, 8), st.integers(0, 2**32 - 1))
@settings(max_examples=100, deadline=None)
def test_power_iteration_psd_angle_improves(d, seed):
    """On a PSD matrix, 3 power steps from uniform v₀ never DECREASE
    alignment with the true dominant eigenvector (and stay unit-norm)
    — the convergence property behind pca_top_eigenvector."""
    rng = np.random.RandomState(seed)
    A = rng.randn(d, d)
    M = A.T @ A  # PSD
    evals, evecs = np.linalg.eigh(M)
    top = evecs[:, -1]
    v = np.ones(d) / np.sqrt(d)
    a_before = abs(v @ top)
    for _ in range(3):
        w = M @ v
        nrm = np.linalg.norm(w)
        if nrm == 0:
            return  # degenerate all-zero matrix: nothing to assert
        v = w / nrm
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    assert abs(v @ top) >= a_before - 1e-9


def _pagerank(edges, nodes, d=0.85, n_iter=3):
    from collections import defaultdict

    wout = defaultdict(float)
    for s, t, w in edges:
        wout[s] += w
    pr = {u: 1.0 / len(nodes) for u in nodes}
    for _ in range(n_iter):
        mass = defaultdict(float)
        for s, t, w in edges:
            mass[t] += pr[s] * (w / wout[s])
        pr = {
            u: (1 - d) / len(nodes) + d * mass.get(u, 0.0)
            for u in nodes
        }
    return pr


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6), st.integers(1, 9)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_pagerank_mass_bounds(raw_edges):
    """0 < Σpr ≤ 1 and every node ≥ (1−d)/N — dangling mass only ever
    leaks, never inflates (the invariant pagerank_event_transitions'
    test asserts on the fixture, here for arbitrary graphs)."""
    # collapse duplicate (s,t) edges; nodes = endpoints
    agg = {}
    for s, t, w in raw_edges:
        agg[(s, t)] = agg.get((s, t), 0) + w
    edges = [(s, t, w) for (s, t), w in agg.items()]
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    pr = _pagerank(edges, nodes)
    total = sum(pr.values())
    assert 0.0 < total <= 1.0 + 1e-12
    floor = 0.15 / len(nodes)
    assert all(v >= floor - 1e-12 for v in pr.values())
