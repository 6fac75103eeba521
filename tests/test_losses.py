"""Loss-layer gradient checks.

The analytic losses (sse, multiclass, binary, sse_mask on its own error) are
checked against float64 finite differences of their own value; the
deliberately non-analytic reference gradients (weighted_sse missing a weight
factor, rmse's rmse*(y-t), ce's +-100 clamp) are checked against the
reference formulas directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.models import losses
from lstm_rnn_tpu.ops.masking import pattypes_from_lengths


@pytest.fixture(autouse=True)
def x64():
    # finite differences of 1/p-style gradients need float64
    with jax.enable_x64():
        yield


def _fd_grad(f, y, eps=1e-4):
    g = np.zeros_like(y)
    flat = y.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        old = flat[i]
        flat[i] = old + eps
        hi = float(f(jnp.asarray(y)))
        flat[i] = old - eps
        lo = float(f(jnp.asarray(y)))
        flat[i] = old
        gf[i] = (hi - lo) / (2 * eps)
    return g


@pytest.fixture
def setup(rng):
    T, B, L = 4, 2, 3
    y = rng.uniform(0.1, 0.9, (T, B, L)).astype(np.float64)
    pt = pattypes_from_lengths([4, 2], T, B)
    return T, B, L, y, pt


def test_sse_grad_matches_fd(setup, rng):
    T, B, L, y, pt = setup
    t = rng.uniform(0, 1, (T, B, L))
    f = lambda yy: losses.sse(yy, jnp.asarray(t), jnp.asarray(pt))
    g = jax.grad(f)(jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(g), _fd_grad(f, y.copy()),
                               rtol=1e-4, atol=1e-6)


def test_multiclass_grad_matches_fd(setup, rng):
    T, B, L, y, pt = setup
    tc = rng.randint(0, L, (T, B)).astype(np.int32)
    tc[pt == 0] = -1
    f = lambda yy: losses.multiclass_classification(yy, jnp.asarray(tc),
                                                    jnp.asarray(pt))
    g = jax.grad(f)(jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(g), _fd_grad(f, y.copy()),
                               rtol=1e-4, atol=1e-6)


def test_binary_grad_matches_fd(rng):
    T, B = 5, 2
    y = rng.uniform(0.2, 0.8, (T, B, 1)).astype(np.float64)
    pt = pattypes_from_lengths([5, 3], T, B)
    tc = rng.randint(0, 2, (T, B)).astype(np.int32)
    f = lambda yy: losses.binary_classification(yy, jnp.asarray(tc),
                                                jnp.asarray(pt))
    g = jax.grad(f)(jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(g), _fd_grad(f, y.copy()),
                               rtol=1e-4, atol=1e-6)


def test_sse_mask_grad_matches_fd(setup, rng):
    T, B, L, y, pt = setup
    targets = rng.uniform(0.1, 1.0, (T, B, 2 * L))
    f = lambda yy: losses.sse_mask(yy, jnp.asarray(targets), jnp.asarray(pt))
    g = jax.grad(f)(jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(g), _fd_grad(f, y.copy()),
                               rtol=1e-4, atol=1e-6)


def test_weighted_sse_quirk_grad(setup, rng):
    """Reference grad = (y-t)*w, deliberately MISSING the second w factor
    (WeightedSsePostOutputLayer.cu:89) — i.e. NOT d(value)/dy."""
    T, B, L, y, pt = setup
    targets = rng.uniform(0.1, 1.0, (T, B, 2 * L))
    g = jax.grad(lambda yy: losses.weighted_sse(
        yy, jnp.asarray(targets), jnp.asarray(pt)))(jnp.asarray(y))
    t = targets[..., 0::2]
    w = targets[..., 1::2]
    m = (pt != 0).astype(np.float64)[..., None]
    np.testing.assert_allclose(np.asarray(g), (y - t) * w * m,
                               rtol=1e-6, atol=1e-12)
    # sanity: the analytic derivative WOULD carry w^2 — assert they differ
    assert np.abs(np.asarray(g) - (y - t) * w * w * m).max() > 1e-3


def test_rmse_quirk_grad(setup, rng):
    """Reference grad = rmse * (y - t) (RmsePostOutputLayer.cu:93)."""
    T, B, L, y, pt = setup
    t = rng.uniform(0, 1, (T, B, L))
    g = jax.grad(lambda yy: losses.rmse(
        yy, jnp.asarray(t), jnp.asarray(pt)))(jnp.asarray(y))
    m = (pt != 0).astype(np.float64)
    r = np.sqrt(np.mean((y - t) ** 2, axis=-1)) * m
    np.testing.assert_allclose(np.asarray(g), r[..., None] * (y - t),
                               rtol=1e-5, atol=1e-12)


def test_ce_clamped_grad(setup, rng):
    """Reference grad = clamp(-t/y, -100, 100) (CePostOutputLayer.cu:96)."""
    T, B, L, y, pt = setup
    y[0, 0, 0] = 1e-5  # forces the clamp to engage (t/y >> 100)
    t = rng.uniform(0.5, 1.0, (T, B, L))
    g = jax.grad(lambda yy: losses.ce(
        yy, jnp.asarray(t), jnp.asarray(pt)))(jnp.asarray(y))
    m = (pt != 0).astype(np.float64)[..., None]
    expect = np.clip(-t / np.maximum(y, 1.1754944e-38), -100, 100) * m
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-6, atol=1e-12)
    assert float(np.asarray(g)[0, 0, 0]) == -100.0
