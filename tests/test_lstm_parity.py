"""jax LSTM/BLSTM vs the float64 NumPy oracle: forward and gradients.

The gradient check compares jax autodiff (with the grad_clip preactivation
wrappers) against the oracle's hand-written CURRENNT BPTT, proving the
autodiff formulation reproduces ComputeBlockErrorsFn/ComputeWeightUpdateFn.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.models.lstm import lstm_forward
from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

from . import oracle


def make_params(rng, P, L, bidirectional, scale=0.5):
    d = 2 if bidirectional else 1
    h = L // d
    return {
        "W_in": rng.uniform(-scale, scale, (d, P, 4, h)),
        "W_rec": rng.uniform(-scale, scale, (d, h, 4, h)),
        "b": rng.uniform(-scale, scale, (d, 4, h)),
        "peep": rng.uniform(-scale, scale, (d, 3, h)),
    }


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("bias_mult", [1.0, 0.0])
def test_forward_matches_oracle(rng, bidirectional, bias_mult):
    T, B, P, L = 7, 3, 5, 8
    params = make_params(rng, P, L, bidirectional)
    x = rng.uniform(-1, 1, (T, B, P))
    pt = pattypes_from_lengths([7, 4, 1], T, B)

    y_ref = oracle.lstm(params, x, pt, bias_mult, bidirectional)
    y_jax = lstm_forward(
        jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params),
        jnp.asarray(x, jnp.float32), jnp.asarray(pt), bias_mult, bidirectional)
    np.testing.assert_allclose(np.asarray(y_jax), y_ref, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_gradients_match_reference_bptt(rng, bidirectional):
    T, B, P, L = 6, 3, 4, 6
    # larger weights so some gate deltas actually hit the +-1 clip
    params = make_params(rng, P, L, bidirectional, scale=1.5)
    x = rng.uniform(-2, 2, (T, B, P))
    pt = pattypes_from_lengths([6, 3, 5], T, B)
    err_out = rng.uniform(-3, 3, (T, B, L))  # incoming dE/dy

    # oracle: hand-written BPTT with limitedError clipping
    prev_err_ref, grads_ref = oracle.lstm_backward(params, x, pt, 1.0, bidirectional, err_out)

    # jax: autodiff through the scan with grad_clip'd preactivations
    def scalar_loss(p, xx):
        y = lstm_forward(p, xx, jnp.asarray(pt), 1.0, bidirectional)
        return jnp.sum(y * jnp.asarray(err_out, jnp.float32))

    p32 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    g_params, g_x = jax.grad(scalar_loss, argnums=(0, 1))(p32, jnp.asarray(x, jnp.float32))

    for k in grads_ref:
        np.testing.assert_allclose(
            np.asarray(g_params[k]), grads_ref[k], rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch for {k}")
    np.testing.assert_allclose(np.asarray(g_x), prev_err_ref, rtol=5e-4, atol=5e-5)


def test_clipping_active(rng):
    """Sanity: the test regime actually exercises the +-1 delta clip."""
    T, B, P, L = 6, 3, 4, 6
    params = make_params(rng, P, L, False, scale=1.5)
    x = rng.uniform(-2, 2, (T, B, P))
    pt = pattypes_from_lengths([6, 6, 6], T, B)
    err_out = rng.uniform(-3, 3, (T, B, L))

    clipped = lstm_forward(
        jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params),
        jnp.asarray(x, jnp.float32), jnp.asarray(pt), 1.0, False, clip_gradients=True)

    def loss(p, clip):
        y = lstm_forward(p, jnp.asarray(x, jnp.float32), jnp.asarray(pt), 1.0, False,
                         clip_gradients=clip)
        return jnp.sum(y * jnp.asarray(err_out, jnp.float32))

    p32 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    g_clip = jax.grad(lambda p: loss(p, True))(p32)
    g_noclip = jax.grad(lambda p: loss(p, False))(p32)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_clip, g_noclip)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-3, (
        "clipping made no difference; test regime too tame: " + str(diffs))
    del clipped


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("remat_blocks", [2, 3])
def test_remat_blocks_matches_plain_scan(rng, bidirectional, remat_blocks):
    """Gradient checkpointing over K time blocks (remat_blocks, the
    single-chip long-sequence memory lever) must leave forward outputs
    AND gradients identical to the plain scan — including K not dividing
    T (zero-mask pad steps after the stream's real frames)."""
    T, B, P, L = 7, 3, 5, 8
    params = make_params(rng, P, L, bidirectional)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params)
    x = jnp.asarray(rng.uniform(-1, 1, (T, B, P)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([7, 4, 1], T, B))
    g_out = jnp.asarray(rng.uniform(-1, 1, (T, B, L)), jnp.float32)

    def loss(p, k):
        y = lstm_forward(p, x, pt, 1.0, bidirectional, backend="scan",
                         remat_blocks=k)
        return jnp.sum(y * g_out), y

    (e0, y0), g0 = jax.value_and_grad(loss, has_aux=True)(params, 0)
    (e1, y1), g1 = jax.value_and_grad(loss, has_aux=True)(
        params, remat_blocks)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-6)
    flat0, _ = jax.tree_util.tree_flatten(g0)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_remat_blocks_rejects_pallas_backend(rng):
    """remat_blocks only applies to the scan backend; the explicit pallas
    path must fail loudly rather than silently ignore the flag (the auto
    path forces the scan backend instead)."""
    params = make_params(rng, 5, 8, True)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 2, 5)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([4, 3], 4, 2))
    with pytest.raises(ValueError, match="remat_blocks"):
        lstm_forward(params, x, pt, 1.0, True,
                     backend="pallas_interpret", remat_blocks=2)


def test_trainer_remat_disables_padded_view():
    """net.remat_blocks > 0 forces the exact layout so lstm_forward's auto
    branch picks the scan backend (the padded fused-kernel view would
    silently ignore the flag)."""
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.trainer import Trainer

    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "b1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "post", "type": "multiclass_classification", "size": 4},
    ]
    net = Network(layers, backend="pallas_interpret")
    net.init_params(3)
    assert Trainer(net, None, device_cache=False).padded
    net.remat_blocks = 2
    assert not Trainer(net, None, device_cache=False).padded


def test_remat_blocks_reduce_backward_memory(rng):
    """--remat_blocks exists to shrink backward residuals: XLA
    memory_analysis of the compiled grad must show a real reduction."""
    params = make_params(rng, 16, 32, True)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params)
    T, B = 512, 4
    x = jnp.zeros((T, B, 16), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([T] * B, T, B))

    def loss(p, k):
        y = lstm_forward(p, x, pt, 1.0, True, backend="scan",
                         remat_blocks=k)
        return jnp.sum(y * y)

    temp = {}
    for k in (0, 8):
        c = jax.jit(jax.grad(lambda p: loss(p, k))).lower(params).compile()
        temp[k] = c.memory_analysis().temp_size_in_bytes
    # measured ~2.1x at these shapes (the [T,...] acts input stream is
    # not rematerializable); assert a conservative 1.5x
    assert temp[8] * 1.5 < temp[0], temp
