"""Hypothesis property tests (the SURVEY §4(b) strategy): W₁ metric
axioms, quantization sum preservation, SE(3)↔7-DoF round trip,
projection permutation invariance, and the ring-path structure contract
on randomized streams with forced leading holes — the input class where
the round-3 review found a contract-valid stream that mis-encoded.

Shapes are FIXED inside every property (hypothesis varies values and
seeds only) so each jitted kernel compiles once per test.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

pytest.importorskip("hypothesis")

import jax.numpy as jnp
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from neural_spectral_codec_tpu.ops.quantization import (
    dequantize, pose_from_7dof, pose_to_7dof, quantize,
    quat_wxyz_to_matrix)
from neural_spectral_codec_tpu.ops.range_image import (
    ProjectionConfig, pad_points, project_points)
from neural_spectral_codec_tpu.ops.ring_path import (
    encode_structured, make_structured_ring_scans, prepare_structured)
from neural_spectral_codec_tpu.ops.spectral import (
    SpectralEncoderConfig, encode_points_batch)
from neural_spectral_codec_tpu.ops.wasserstein import (
    wasserstein_1d, wasserstein_matrix, wasserstein_matrix_chunked)

_D = 32
_hist = hnp.arrays(np.float32, (_D,),
                   elements=st.floats(0.0, 1e4, width=32,
                                      allow_nan=False, allow_infinity=False))


# ------------------------------------------------------------------ W₁

@given(_hist, _hist, _hist)
@settings(max_examples=50, deadline=None)
def test_w1_metric_axioms(h1, h2, h3):
    """W₁ = L1 between (normalized) CDFs, so the pseudometric axioms must
    hold: non-negativity, identity, exact symmetry, triangle inequality."""
    a, b, c = (jnp.asarray(x) for x in (h1, h2, h3))
    d_ab = float(wasserstein_1d(a, b))
    d_ba = float(wasserstein_1d(b, a))
    d_ac = float(wasserstein_1d(a, c))
    d_cb = float(wasserstein_1d(c, b))
    assert d_ab >= 0.0
    assert float(wasserstein_1d(a, a)) == 0.0
    assert d_ab == d_ba  # |x-y| is exactly commutative in floats
    assert d_ab <= d_ac + d_cb + 1e-4 * (1.0 + d_ac + d_cb)


@given(hnp.arrays(np.float32, (5, _D),
                  elements=st.floats(0.0, 1e4, width=32, allow_nan=False,
                                     allow_infinity=False)),
       hnp.arrays(np.float32, (7, _D),
                  elements=st.floats(0.0, 1e4, width=32, allow_nan=False,
                                     allow_infinity=False)))
@settings(max_examples=25, deadline=None)
def test_w1_matrix_chunked_consistent(H1, H2):
    """The memory-bounded chunked all-pairs kernel must agree with the
    broadcast one on every entry (chunk smaller than N1 forces padding)."""
    a, b = jnp.asarray(H1), jnp.asarray(H2)
    full = np.asarray(wasserstein_matrix(a, b))
    chunked = np.asarray(wasserstein_matrix_chunked(a, b, chunk=2))
    # lax.map changes the reduction order; distances scale with D
    np.testing.assert_allclose(chunked, full, atol=2e-5, rtol=1e-6)


# --------------------------------------------------------- quantization

@given(_hist)
@settings(max_examples=50, deadline=None)
def test_quantize_sum_preservation_and_error_bound(h):
    """Reference quantization.py:131-168 semantics: any histogram that
    quantizes to a nonzero code must sum to exactly 65535 (error
    redistributed into the argmax bin), and the dequantized values must
    be within the redistribution bound of the normalized input."""
    q = np.asarray(quantize(jnp.asarray(h)), np.int64)
    if q.sum() == 0:
        return  # degenerate all-(near)zero input: codes stay zero
    assert int(q.sum()) == 65535
    s = float(np.sum(h, dtype=np.float64))
    want = h.astype(np.float64) / (s + 1e-8)
    got = np.asarray(dequantize(jnp.asarray(q.astype(np.uint16))),
                     np.float64)
    # per-bin rounding ≤ 0.5/65535; the argmax bin absorbs ≤ D/2 of them
    assert np.abs(got - want).max() <= (_D / 2 + 2) / 65535.0


# ------------------------------------------------------------ SE(3) 7-DoF

@given(st.lists(st.floats(-1.0, 1.0), min_size=4, max_size=4)
       .filter(lambda q: float(np.linalg.norm(q)) > 1e-2),
       st.lists(st.floats(-1e3, 1e3), min_size=3, max_size=3))
@settings(max_examples=100, deadline=None)
def test_pose_7dof_roundtrip(q, t):
    q = np.asarray(q, np.float64)
    q /= np.linalg.norm(q)
    T = np.eye(4)
    T[:3, :3] = quat_wxyz_to_matrix(q)
    T[:3, 3] = t
    T2 = pose_from_7dof(pose_to_7dof(T))
    np.testing.assert_allclose(T2, T, atol=1e-9 * (1 + np.abs(T).max()))


# ------------------------------------------------------------ projection

_PROJ = ProjectionConfig(n_elevation=16, n_azimuth=90)


@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_projection_permutation_invariant(seed, pseed):
    """Scatter-min projection is a pure min-reduction per pixel, so any
    permutation of the input cloud must give the identical image — the
    invariant the sort-based lowering must preserve."""
    rng = np.random.default_rng(seed)
    pts = np.empty((512, 4), np.float32)
    r = rng.uniform(0.2, 120.0, 512)  # includes out-of-gate ranges
    az = rng.uniform(0, 2 * np.pi, 512)
    el = rng.uniform(-0.6, 0.2, 512)
    pts[:, 0] = r * np.cos(el) * np.cos(az)
    pts[:, 1] = r * np.cos(el) * np.sin(az)
    pts[:, 2] = r * np.sin(el)
    pts[:, 3] = rng.uniform(0, 1, 512)
    pts[rng.random(512) < 0.05] = np.nan  # invalid rows
    perm = np.random.default_rng(pseed).permutation(512)
    a = np.asarray(project_points(jnp.asarray(pts), _PROJ))
    b = np.asarray(project_points(jnp.asarray(pts[perm]), _PROJ))
    np.testing.assert_array_equal(a, b)


# -------------------------------------------------------- ring contract

_CFG_ENC = SpectralEncoderConfig()  # 64 x 360, the full-size hot path
_N_RINGS, _PER_RING = 64, 256


@given(st.integers(0, 2**31 - 1), st.floats(0.0, 0.3),
       st.integers(0, 64))
@settings(max_examples=12, deadline=None)
def test_ring_path_contract_random_streams(seed, dropout, lead_hole):
    """Any contract-satisfying structured stream — random sweep starts,
    random dropout, and a FORCED run of leading holes on ring 0 (the
    round-3 phantom-run-start trigger) — must encode bit-identically to
    the general sorted path."""
    pts = make_structured_ring_scans(1, _N_RINGS, _PER_RING,
                                     _CFG_ENC.projection,
                                     seed=seed, dropout=dropout)[0]
    pts[0, :lead_hole] = np.nan
    flat = pts.reshape(-1, 4)
    ring_ids = np.repeat(np.arange(_N_RINGS), _PER_RING)

    prep = prepare_structured(flat, ring_ids, _CFG_ENC,
                              per_ring=_PER_RING)
    assert prep is not None, "by-construction stream must pass the contract"

    got = encode_structured(flat, ring_ids, 2.0, _CFG_ENC,
                            per_ring=_PER_RING)
    want = np.asarray(encode_points_batch(
        jnp.asarray(pad_points(flat, flat.shape[0])[None]),
        jnp.float32(2.0), _CFG_ENC))[0]
    np.testing.assert_array_equal(got, want)
