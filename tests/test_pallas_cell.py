"""Fused Pallas LSTM scan vs the lax.scan reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.models.lstm import _lstm_scan
from lstm_rnn_tpu.ops.lstm_cell import lstm_scan_fused


def _setup(rng, D, T, B, H, scale=1.2):
    acts = rng.uniform(-2, 2, (D, T, B, 4 * H)).astype(np.float32)
    w_rec = rng.uniform(-scale, scale, (D, H, 4 * H)).astype(np.float32)
    peep = rng.uniform(-scale, scale, (D, 3, H)).astype(np.float32)
    lengths = rng.randint(1, T + 1, B).astype(np.int32)
    lengths[0] = T
    return acts, w_rec, peep, lengths


def _identity_w_in(D, H4):
    """Per-direction selector so arbitrary precomputed acts can be fed
    through the in-kernel input projection: x = [acts_0 | acts_1],
    w_in[d] = rows selecting direction d."""
    w_in = np.zeros((D, D * H4, H4), np.float32)
    for d in range(D):
        w_in[d, d * H4:(d + 1) * H4] = np.eye(H4, dtype=np.float32)
    return jnp.asarray(w_in)


def _fused_from_acts(acts, w_rec, peep, bias, lengths, bias_mult, clip,
                     interpret):
    """acts [D,T,B,4H] -> lstm_scan_fused via the identity projection;
    re-splits the kernel's [T,B,D*H] output into [D,T,B,H] for comparison."""
    D = acts.shape[0]
    H4 = acts.shape[-1]
    H = H4 // 4
    x = jnp.concatenate([acts[d] for d in range(D)], axis=-1)
    y = lstm_scan_fused(x, _identity_w_in(D, H4), w_rec, peep, bias,
                        lengths, bias_mult, clip, interpret)
    return jnp.stack([y[..., i * H:(i + 1) * H] for i in range(D)], axis=0)


def _scan_reference(acts, w_rec, peep, lengths, clip=True):
    """Run the lax.scan path on the same NATURAL-order [D,T,B,4H] layout
    (the scan path needs the bw direction's acts/mask time-reversed and its
    outputs re-reversed; the fused kernel does this via block indexing)."""
    D, T, B, H4 = acts.shape
    H = H4 // 4
    acts = jnp.asarray(acts)
    if D == 2:
        acts = jnp.concatenate([acts[0:1], acts[1:2, ::-1]], axis=0)
    a = jnp.transpose(acts.reshape(D, T, B, 4, H), (1, 0, 2, 3, 4))
    t_idx = np.arange(T)[:, None]
    mask_fw = (t_idx < lengths[None, :]).astype(np.float32)
    masks = [mask_fw]
    if D == 2:
        masks.append(mask_fw[::-1])
    mask = jnp.asarray(np.stack(masks, axis=1)[..., None])  # [T, D, B, 1]
    w4 = jnp.asarray(w_rec).reshape(D, H, 4, H)
    ys = _lstm_scan(a, w4, jnp.asarray(peep), mask, clip)
    ys = jnp.transpose(ys, (1, 0, 2, 3))  # [D, T, B, H]
    if D == 2:
        ys = jnp.concatenate([ys[0:1], ys[1:2, ::-1]], axis=0)
    return ys


@pytest.mark.parametrize("D", [1, 2])
def test_forward_matches_scan(rng, D):
    T, B, H = 12, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, D, T, B, H)
    y_ref = _scan_reference(acts, w_rec, peep, lengths)
    zb = jnp.zeros((acts.shape[0], acts.shape[-1]), jnp.float32)
    y_pal = _fused_from_acts(jnp.asarray(acts), jnp.asarray(w_rec),
                             jnp.asarray(peep), zb, jnp.asarray(lengths),
                             0.0, True, True)
    # fp32 matmul-order differences amplified by the recurrence: ~4e-5 over
    # 12 steps at weight scale 1.2
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("D", [1, 2])
@pytest.mark.parametrize("clip", [True, False])
def test_backward_matches_scan(rng, D, clip):
    T, B, H = 10, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, D, T, B, H)
    dy = rng.uniform(-3, 3, (D, T, B, H)).astype(np.float32)

    def loss_pal(a, w, p):
        zb = jnp.zeros((a.shape[0], a.shape[-1]), jnp.float32)
        y = _fused_from_acts(a, w, p, zb, jnp.asarray(lengths), 0.0, clip,
                             True)
        return jnp.sum(y * dy)

    def loss_ref(a, w, p):
        y = _scan_reference(a, w, p, lengths, clip)
        return jnp.sum(y * dy)

    args = (jnp.asarray(acts), jnp.asarray(w_rec), jnp.asarray(peep))
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for gp, gr, name in zip(g_pal, g_ref, ["acts", "w_rec", "peep"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_layer_level_with_padding(rng, bidirectional):
    """lstm_forward pallas path with H=10 (padded to 128) and B=3 (padded to
    8) must match the scan path — validates padding invariance end to end,
    forward and gradients."""
    import jax

    from lstm_rnn_tpu.models.lstm import lstm_forward
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

    T, B, P, L = 9, 3, 5, 10
    d = 2 if bidirectional else 1
    h = L // d
    params = {
        "W_in": jnp.asarray(rng.uniform(-1, 1, (d, P, 4, h)), jnp.float32),
        "W_rec": jnp.asarray(rng.uniform(-1, 1, (d, h, 4, h)), jnp.float32),
        "b": jnp.asarray(rng.uniform(-1, 1, (d, 4, h)), jnp.float32),
        "peep": jnp.asarray(rng.uniform(-1, 1, (d, 3, h)), jnp.float32),
    }
    x = jnp.asarray(rng.uniform(-1, 1, (T, B, P)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([9, 4, 7], T, B))
    dy = jnp.asarray(rng.uniform(-2, 2, (T, B, L)), jnp.float32)

    def loss(p, bk):
        y = lstm_forward(p, x, pt, 1.0, bidirectional, backend=bk)
        return jnp.sum(y * dy), y

    (l_ref, y_ref), g_ref = jax.value_and_grad(
        lambda p: loss(p, "scan"), has_aux=True)(params)
    (l_pal, y_pal), g_pal = jax.value_and_grad(
        lambda p: loss(p, "pallas_interpret"), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_pal[k]), np.asarray(g_ref[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)


def test_f32_matmul_3x_close_to_exact(rng):
    """--f32_matmul 3x (hi/lo bf16 decomposition): same kernels, ~5e-7
    relative matmul error — outputs and gradients must track the exact
    6-pass mode tightly."""
    from lstm_rnn_tpu.ops import lstm_cell as lc

    D, T, B, H = 2, 32, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, D, T, B, H, scale=0.3)
    bias = jnp.zeros((D, 4 * H), jnp.float32)

    def run():
        def loss(w_rec):
            y = _fused_from_acts(jnp.asarray(acts), w_rec,
                                 jnp.asarray(peep), bias,
                                 jnp.asarray(lengths), 1.0, True, True)
            return jnp.sum(y * y), y

        (l, y), g = jax.value_and_grad(loss, has_aux=True)(jnp.asarray(w_rec))
        return float(l), np.asarray(y), np.asarray(g)

    l0, y0, g0 = run()
    old = lc.F32_MATMUL_3X
    lc.F32_MATMUL_3X = True
    try:
        l1, y1, g1 = run()
    finally:
        lc.F32_MATMUL_3X = old
    assert abs(l1 - l0) < 1e-4 * abs(l0)
    np.testing.assert_allclose(y1, y0, rtol=0, atol=5e-5)
    scale = np.abs(g0).max()
    np.testing.assert_allclose(g1, g0, rtol=0, atol=1e-4 * scale)
