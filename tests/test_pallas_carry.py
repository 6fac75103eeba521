"""Carry-capable fused LSTM scan (lstm_scan_fused_carry) vs the plain
fused kernel and the lax.scan reference — the primitive behind streaming
inference and sequence parallelism (VERDICT r3 item #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.models.lstm import _lstm_scan
from lstm_rnn_tpu.ops.lstm_cell import lstm_scan_fused, lstm_scan_fused_carry

from .test_pallas_cell import _identity_w_in, _setup


def _carry_from_acts(acts, w_rec, peep, bias, lengths, h0, c0, bias_mult,
                     clip, interpret):
    """acts [D,T,B,4H] -> lstm_scan_fused_carry via the identity projection
    (mirrors test_pallas_cell._fused_from_acts)."""
    D = acts.shape[0]
    H4 = acts.shape[-1]
    H = H4 // 4
    x = jnp.concatenate([acts[d] for d in range(D)], axis=-1)
    y, (hf, cf) = lstm_scan_fused_carry(
        x, _identity_w_in(D, H4), w_rec, peep, bias, lengths, h0, c0,
        bias_mult, clip, interpret)
    ys = jnp.stack([y[..., i * H:(i + 1) * H] for i in range(D)], axis=0)
    return ys, hf, cf


@pytest.mark.parametrize("D", [1, 2])
def test_zero_carry_matches_plain_kernel(rng, D):
    """With zero carries the carry kernel must reproduce the plain kernel
    EXACTLY — outputs and every gradient (same op order by construction)."""
    T, B, H = 12, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, D, T, B, H)
    dy = rng.uniform(-2, 2, (D, T, B, H)).astype(np.float32)
    zb = jnp.zeros((D, 4 * H), jnp.float32)
    z = jnp.zeros((D, B, H), jnp.float32)
    args = (jnp.asarray(acts), jnp.asarray(w_rec), jnp.asarray(peep))

    def loss_plain(a, w, p):
        from .test_pallas_cell import _fused_from_acts
        y = _fused_from_acts(a, w, p, zb, jnp.asarray(lengths), 0.0, True,
                             True)
        return jnp.sum(y * dy)

    def loss_carry(a, w, p):
        ys, _hf, _cf = _carry_from_acts(a, w, p, zb, jnp.asarray(lengths),
                                        z, z, 0.0, True, True)
        return jnp.sum(ys * dy)

    l0, g0 = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(*args)
    l1, g1 = jax.value_and_grad(loss_carry, argnums=(0, 1, 2))(*args)
    assert float(l0) == float(l1)
    for a, b, name in zip(g0, g1, ["acts", "w_rec", "peep"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_carry_chaining_matches_whole_sequence(rng):
    """Two chained carry-kernel calls == one whole-sequence call (D=1):
    outputs, final state, and gradients through the chain."""
    D, T, B, H = 1, 16, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, D, T, B, H)
    T1 = 8
    zb = jnp.zeros((D, 4 * H), jnp.float32)
    z = jnp.zeros((D, B, H), jnp.float32)
    dy = rng.uniform(-2, 2, (D, T, B, H)).astype(np.float32)
    l1 = np.minimum(lengths, T1).astype(np.int32)
    l2 = np.maximum(lengths - T1, 0).astype(np.int32)
    args = (jnp.asarray(acts), jnp.asarray(w_rec), jnp.asarray(peep))

    def whole(a, w, p):
        ys, hf, cf = _carry_from_acts(a, w, p, zb, jnp.asarray(lengths),
                                      z, z, 0.0, True, True)
        return ys, hf, cf

    def chained(a, w, p):
        y1, h1, c1 = _carry_from_acts(a[:, :T1], w, p, zb, jnp.asarray(l1),
                                      z, z, 0.0, True, True)
        y2, h2, c2 = _carry_from_acts(a[:, T1:], w, p, zb, jnp.asarray(l2),
                                      h1, c1, 0.0, True, True)
        return jnp.concatenate([y1, y2], axis=1), h2, c2

    ys_w, hf_w, cf_w = whole(*args)
    ys_c, hf_c, cf_c = chained(*args)
    np.testing.assert_allclose(np.asarray(ys_c), np.asarray(ys_w),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hf_c), np.asarray(hf_w),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cf_c), np.asarray(cf_w),
                               rtol=0, atol=1e-6)

    # gradients through the chained carry == whole-sequence gradients
    def loss(fn, a, w, p):
        ys, hf, cf = fn(a, w, p)
        return jnp.sum(ys * dy) + jnp.sum(hf) + 0.5 * jnp.sum(cf)

    g_w = jax.grad(lambda *a: loss(whole, *a), argnums=(0, 1, 2))(*args)
    g_c = jax.grad(lambda *a: loss(chained, *a), argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_c, g_w, ["acts", "w_rec", "peep"]):
        scale = float(np.abs(np.asarray(b)).max()) or 1.0
        # the chained path bundles the carry's cs terms into dc0 before the
        # next call re-expands them — pure float reassociation, ~4e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5 * scale, err_msg=name)


def test_dir_offset_runs_descending_direction(rng):
    """A D=1 kernel with dir_offset=1 must reproduce the D=2 kernel's
    backward half over natural-order arrays (SP's per-device block scan
    for the BLSTM backward direction), including carry chaining in
    descending block order."""
    T, B, H = 16, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, 2, T, B, H)
    zb2 = jnp.zeros((2, 4 * H), jnp.float32)
    zb1 = jnp.zeros((1, 4 * H), jnp.float32)
    z2 = jnp.zeros((2, B, H), jnp.float32)
    z1 = jnp.zeros((1, B, H), jnp.float32)

    # reference: the D=2 kernel's d=1 output half + no carries
    ys2, hf2, cf2 = _carry_from_acts(jnp.asarray(acts), jnp.asarray(w_rec),
                                     jnp.asarray(peep), zb2,
                                     jnp.asarray(lengths), z2, z2, 0.0,
                                     True, True)
    from lstm_rnn_tpu.ops.lstm_cell import lstm_scan_fused_carry

    def bw_half(a_slice, lens, h0, c0):
        x = a_slice[0]  # [T, B, 4H] acts for the bw direction
        y, (hf, cf) = lstm_scan_fused_carry(
            x, _identity_w_in(1, 4 * H), jnp.asarray(w_rec[1:2]),
            jnp.asarray(peep[1:2]), zb1, lens, h0, c0, 0.0, True, True,
            jnp.float32, True, None, 1)
        return y, hf, cf

    y1, hf1, cf1 = bw_half(jnp.asarray(acts[1:2]), jnp.asarray(lengths),
                           z1, z1)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(ys2[1]))
    np.testing.assert_array_equal(np.asarray(hf1[0]), np.asarray(hf2[1]))
    np.testing.assert_array_equal(np.asarray(cf1[0]), np.asarray(cf2[1]))

    # descending carry chain: block B (t in [8,16)) first, its final state
    # feeds block A (t in [0,8)) — equals the whole-sequence run
    T1 = 8
    lA = np.minimum(lengths, T1).astype(np.int32)
    lB = np.maximum(lengths - T1, 0).astype(np.int32)
    yB, hB, cB = bw_half(jnp.asarray(acts[1:2, T1:]), jnp.asarray(lB),
                         z1, z1)
    yA, hA, cA = bw_half(jnp.asarray(acts[1:2, :T1]), jnp.asarray(lA),
                         hB, cB)
    y_chain = jnp.concatenate([yA, yB], axis=0)
    np.testing.assert_allclose(np.asarray(y_chain), np.asarray(ys2[1]),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hA[0]), np.asarray(hf2[1]),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("D", [1, 2])
def test_carry_matches_scan_reference(rng, D):
    """Nonzero initial state + final-state cotangents vs the lax.scan path
    (init/return_carry) — the exact semantics streaming and SP chain on."""
    T, B, H = 10, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, D, T, B, H)
    h0 = rng.uniform(-1, 1, (D, B, H)).astype(np.float32)
    c0 = rng.uniform(-1, 1, (D, B, H)).astype(np.float32)
    dy = rng.uniform(-2, 2, (D, T, B, H)).astype(np.float32)
    dhf = rng.uniform(-1, 1, (D, B, H)).astype(np.float32)
    dcf = rng.uniform(-1, 1, (D, B, H)).astype(np.float32)
    zb = jnp.zeros((D, 4 * H), jnp.float32)

    def scan_ref(a, w, p, h0, c0):
        # natural-order acts -> the scan layout (bw direction reversed)
        a = jnp.asarray(a)
        if D == 2:
            a = jnp.concatenate([a[0:1], a[1:2, ::-1]], axis=0)
        at = jnp.transpose(a.reshape(D, T, B, 4, H), (1, 0, 2, 3, 4))
        t_idx = np.arange(T)[:, None]
        mask_fw = (t_idx < lengths[None, :]).astype(np.float32)
        masks = [mask_fw] + ([mask_fw[::-1]] if D == 2 else [])
        mask = jnp.asarray(np.stack(masks, axis=1)[..., None])
        w4 = w.reshape(D, H, 4, H)
        ys, (hf, cf) = _lstm_scan(at, w4, p, mask, True, init=(h0, c0),
                                  return_carry=True)
        ys = jnp.transpose(ys, (1, 0, 2, 3))
        if D == 2:
            ys = jnp.concatenate([ys[0:1], ys[1:2, ::-1]], axis=0)
        return ys, hf, cf

    def fused(a, w, p, h0, c0):
        return _carry_from_acts(a, w, p, zb, jnp.asarray(lengths), h0, c0,
                                0.0, True, True)

    args = (jnp.asarray(acts), jnp.asarray(w_rec), jnp.asarray(peep),
            jnp.asarray(h0), jnp.asarray(c0))

    ys_r, hf_r, cf_r = scan_ref(*args)
    ys_f, hf_f, cf_f = fused(*args)
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hf_f), np.asarray(hf_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cf_f), np.asarray(cf_r),
                               rtol=2e-4, atol=2e-4)

    def loss(fn, *a):
        ys, hf, cf = fn(*a)
        return (jnp.sum(ys * dy) + jnp.sum(hf * dhf) + jnp.sum(cf * dcf))

    g_r = jax.grad(lambda *a: loss(scan_ref, *a),
                   argnums=(0, 1, 2, 3, 4))(*args)
    g_f = jax.grad(lambda *a: loss(fused, *a), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_f, g_r, ["acts", "w_rec", "peep", "h0", "c0"]):
        scale = float(np.abs(np.asarray(b)).max()) or 1.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3 * scale, err_msg=name)


def test_step_mask_matches_per_step_masked_scan(rng):
    """step_mask generalizes the prefix-only lengths masking to arbitrary
    per-step validity: a streaming chunk where one sequence ends and
    another starts ([LAST, NONE, FIRST, ...] rows) must match the lax.scan
    path's per-step `h_new * m` semantics exactly — state zeroed at every
    NONE step, real frames after a gap processed from zero state."""
    D, T, B, H = 1, 16, 8, 128
    acts, w_rec, peep, _ = _setup(rng, D, T, B, H)
    # general validity patterns: gaps, restarts, suffix starts, all, none
    mask = np.ones((T, B), np.float32)
    mask[3:6, 0] = 0.0          # mid-chunk gap, then a restart
    mask[:5, 1] = 0.0           # suffix validity (sequence starts late)
    mask[10:, 2] = 0.0          # plain prefix
    mask[:, 3] = 0.0            # fully invalid row
    mask[::2, 4] = 0.0          # pathological alternation
    h0 = rng.uniform(-1, 1, (D, B, H)).astype(np.float32)
    c0 = rng.uniform(-1, 1, (D, B, H)).astype(np.float32)
    lengths = np.full((B,), T, np.int32)  # ignored when step_mask is given

    # reference: the scan cell with the same per-step mask and carry
    ys_r, (hf_r, cf_r) = _lstm_scan(
        jnp.asarray(acts.transpose(1, 0, 2, 3).reshape(T, D, B, 4, H)),
        jnp.asarray(w_rec.reshape(D, H, 4, H)), jnp.asarray(peep),
        jnp.asarray(mask)[:, None, :, None], True,
        init=(jnp.asarray(h0), jnp.asarray(c0)), return_carry=True)

    x = jnp.asarray(acts[0])
    y_f, (hf_f, cf_f) = lstm_scan_fused_carry(
        x, _identity_w_in(D, 4 * H), jnp.asarray(w_rec), jnp.asarray(peep),
        jnp.zeros((D, 4 * H), jnp.float32), jnp.asarray(lengths),
        jnp.asarray(h0), jnp.asarray(c0), 0.0, True, True, jnp.float32,
        True, None, 0, jnp.asarray(mask.T))
    # kernel-vs-scan float noise (matmul accumulation order), same bound
    # as test_carry_vs_scan; the SEMANTIC check is the mask pattern — a
    # prefix-lengths reduction is off by O(1) on the gap/restart rows
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(ys_r[:, 0]),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hf_f), np.asarray(hf_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cf_f), np.asarray(cf_r),
                               rtol=0, atol=2e-4)


def test_step_mask_gradients_raise(rng):
    """step_mask is inference-only: the backward kernels reason in suffix
    masks, so differentiation must fail loudly at trace time rather than
    silently emit prefix-masked gradients for step-masked data."""
    D, T, B, H = 1, 8, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, D, T, B, H)
    z = jnp.zeros((D, B, H), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)

    def loss(a):
        y, _ = lstm_scan_fused_carry(
            a, _identity_w_in(D, 4 * H), jnp.asarray(w_rec),
            jnp.asarray(peep), jnp.zeros((D, 4 * H), jnp.float32),
            jnp.asarray(lengths), z, z, 0.0, True, True, jnp.float32,
            True, None, 0, mask)
        return jnp.sum(y)

    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(loss)(jnp.asarray(acts[0]))


def test_descending_carry_rejects_trailing_padding(rng):
    """A descending direction ENTERS at t=T-1: trailing chunk-alignment
    padding (carry_t < T) would zero the incoming carry before the first
    real frame, so the kernel must reject the combination up front."""
    D, T, B, H = 1, 8, 8, 128
    acts, w_rec, peep, lengths = _setup(rng, D, T, B, H)
    z = jnp.zeros((D, B, H), jnp.float32)
    with pytest.raises(ValueError, match="descending"):
        lstm_scan_fused_carry(
            jnp.asarray(acts[0]), _identity_w_in(D, 4 * H),
            jnp.asarray(w_rec), jnp.asarray(peep),
            jnp.zeros((D, 4 * H), jnp.float32), jnp.asarray(lengths),
            z, z, 0.0, True, True, jnp.float32, True, T - 2, 1)
