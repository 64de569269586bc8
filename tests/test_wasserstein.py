"""W₁ kernel tests: oracle parity + metric axioms."""

import numpy as np
import jax.numpy as jnp

from neural_spectral_codec_tpu.ops import (
    wasserstein_1d,
    wasserstein_batch,
    wasserstein_matrix,
    histogram_cdf,
)
from neural_spectral_codec_tpu.ops.wasserstein import (
    wasserstein_batch_from_cdf,
    wasserstein_matrix_chunked,
)
from oracle import oracle_wasserstein_batch


def _hists(rng, n, d=50):
    h = rng.uniform(0, 1, (n, d)).astype(np.float32)
    return h / h.sum(axis=1, keepdims=True)


def test_batch_matches_oracle(rng):
    q = _hists(rng, 1)[0]
    db = _hists(rng, 100)
    ref = oracle_wasserstein_batch(q, db)
    got = np.asarray(wasserstein_batch(jnp.asarray(q), jnp.asarray(db)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cdf_path_matches_batch(rng):
    q = _hists(rng, 1)[0]
    db = _hists(rng, 64)
    direct = np.asarray(wasserstein_batch(jnp.asarray(q), jnp.asarray(db)))
    via_cdf = np.asarray(
        wasserstein_batch_from_cdf(
            histogram_cdf(jnp.asarray(q)), histogram_cdf(jnp.asarray(db))
        )
    )
    np.testing.assert_allclose(via_cdf, direct, rtol=1e-4, atol=1e-5)


def test_metric_axioms(rng):
    h = _hists(rng, 10)
    D = np.asarray(wasserstein_matrix(jnp.asarray(h), jnp.asarray(h)))
    np.testing.assert_allclose(np.diag(D), 0.0, atol=1e-5)
    np.testing.assert_allclose(D, D.T, atol=1e-5)
    assert (D >= -1e-6).all()
    # triangle inequality on a few triples
    for (i, j, k) in [(0, 1, 2), (3, 4, 5), (6, 7, 8)]:
        assert D[i, k] <= D[i, j] + D[j, k] + 1e-4


def test_scalar_matches_batch(rng):
    a, b = _hists(rng, 2)
    s = float(wasserstein_1d(jnp.asarray(a), jnp.asarray(b)))
    m = float(wasserstein_batch(jnp.asarray(a), jnp.asarray(b[None]))[0])
    np.testing.assert_allclose(s, m, rtol=1e-5)


def test_chunked_matches_full(rng):
    h1 = _hists(rng, 300)
    h2 = _hists(rng, 70)
    full = np.asarray(wasserstein_matrix(jnp.asarray(h1), jnp.asarray(h2)))
    ch = np.asarray(wasserstein_matrix_chunked(jnp.asarray(h1), jnp.asarray(h2), chunk=128))
    np.testing.assert_allclose(ch, full, rtol=1e-5, atol=1e-6)


def test_unnormalized_inputs(rng):
    q = _hists(rng, 1)[0] * 7.0
    db = _hists(rng, 20) * 3.0
    ref = oracle_wasserstein_batch(q, db)
    got = np.asarray(wasserstein_batch(jnp.asarray(q), jnp.asarray(db)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_w1_metric_axioms(rng):
    """W1 on normalized histograms is a metric: identity, symmetry,
    triangle inequality (SURVEY §4 property-test strategy)."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_1d
    h = rng.random((3, 64)).astype(np.float32)
    h /= h.sum(axis=1, keepdims=True)
    a, b, c = (jnp.asarray(x) for x in h)
    dab = float(wasserstein_1d(a, b))
    dba = float(wasserstein_1d(b, a))
    dac = float(wasserstein_1d(a, c))
    dcb = float(wasserstein_1d(c, b))
    assert float(wasserstein_1d(a, a)) < 1e-6            # identity
    assert abs(dab - dba) < 1e-5                         # symmetry
    assert dab <= dac + dcb + 1e-5                       # triangle
    assert dab > 0
