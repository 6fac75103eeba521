"""Fused softmax+CE+accuracy kernel vs the composed reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.models.feedforward import softmax_forward
from lstm_rnn_tpu.models import losses
from lstm_rnn_tpu.ops.softmax_ce import softmax_ce_fused


def _ref(a, tc):
    """Composed reference tail from pre-normalization activations a
    [T,B,S]: CURRENNT softmax (offset (min+max)/2, safeExp) -> multiclass
    CE and argmax counter."""
    from lstm_rnn_tpu.ops.activations import REAL_MIN, safe_exp
    offset = jax.lax.stop_gradient(
        0.5 * (jnp.min(a, axis=-1, keepdims=True)
               + jnp.maximum(jnp.max(a, axis=-1, keepdims=True), REAL_MIN)))
    e = safe_exp(a - offset)
    y = e / jnp.sum(e, axis=-1, keepdims=True)
    loss = losses.multiclass_classification(y, tc, None)
    cnt = losses.multiclass_correct_count(y, tc, None)
    return loss, cnt


@pytest.mark.parametrize("S", [7, 128])
def test_fused_tail_matches_composed(rng, S):
    T, B = 16, 8
    a = jnp.asarray(rng.randn(T, B, S).astype(np.float32) * 3)
    tc = rng.randint(-1, S, (T, B)).astype(np.int32)  # incl. dummy -1 rows
    tc_j = jnp.asarray(tc)

    loss_r, cnt_r = _ref(a, tc_j)

    Sp = -(-S // 128) * 128
    a2 = jnp.pad(a, ((0, 0), (0, 0), (0, Sp - S))).reshape(T * B, Sp)
    tc2 = tc_j.reshape(T * B, 1)
    loss_f, cnt_f = softmax_ce_fused(a2, tc2, S, True, jnp.float32)

    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-6)
    assert int(cnt_f) == int(cnt_r)

    # gradients w.r.t. the logits match the reference Jacobian chain
    g_r = jax.grad(lambda a: _ref(a, tc_j)[0])(a)
    g_f = jax.grad(lambda a: softmax_ce_fused(
        jnp.pad(a, ((0, 0), (0, 0), (0, Sp - S))).reshape(T * B, Sp),
        tc2, S, True, jnp.float32)[0])(a)
    scale = float(jnp.abs(g_r).max())
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=0, atol=1e-6 * scale)


def test_proj_fused_tail_matches_composed(rng):
    """The projection-fused variant (softmax layer matmul in-kernel) must
    match feedforward-identity -> CURRENNT softmax -> CE/count, including
    gradients w.r.t. the hidden input, W and b."""
    from lstm_rnn_tpu.models.feedforward import feedforward_forward
    from lstm_rnn_tpu.ops.softmax_ce import softmax_ce_proj_fused

    T, B, P, S = 8, 4, 128, 7
    Sp = 128
    h = jnp.asarray(rng.randn(T, B, P).astype(np.float32))
    W = jnp.asarray(rng.randn(P, S).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(S).astype(np.float32))
    tc = rng.randint(-1, S, (T, B)).astype(np.int32)
    tc2 = jnp.asarray(tc).reshape(T * B, 1)
    bias_mult = 1.0

    def composed(h, W, b):
        a = feedforward_forward({"W": W, "b": b}, h, "identity", bias_mult)
        return _ref(a, jnp.asarray(tc))

    def fused(h, W, b):
        return softmax_ce_proj_fused(
            h.reshape(T * B, P), jnp.pad(W, ((0, 0), (0, Sp - S))),
            jnp.pad(b, (0, Sp - S)), tc2, S, bias_mult, True, jnp.float32)

    loss_r, cnt_r = composed(h, W, b)
    loss_f, cnt_f = fused(h, W, b)
    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-6)
    assert int(cnt_f) == int(cnt_r)

    g_r = jax.grad(lambda *a: composed(*a)[0], argnums=(0, 1, 2))(h, W, b)
    g_f = jax.grad(lambda *a: fused(*a)[0], argnums=(0, 1, 2))(h, W, b)
    for r, f, name in zip(g_r, g_f, ("dh", "dW", "db")):
        scale = float(jnp.abs(r).max()) or 1.0
        np.testing.assert_allclose(np.asarray(f).reshape(np.asarray(r).shape),
                                   np.asarray(r), rtol=0, atol=1e-5 * scale,
                                   err_msg=name)


def test_wide_fused_tail_matches_composed(rng):
    """The LVCSR-scale wide variant (Sp-column-blocked backward, per-row
    stat residuals) must match feedforward-identity -> CURRENNT softmax ->
    CE/count, including gradients w.r.t. h, W and b — with MULTIPLE column
    blocks and row blocks engaged (VERDICT r3 item #2)."""
    from lstm_rnn_tpu.models.feedforward import feedforward_forward
    from lstm_rnn_tpu.ops.softmax_ce import (softmax_ce_wide_fused,
                                             wide_plan)

    T, B, P, S = 32, 16, 128, 1500
    N = T * B
    spw, sb, rows = wide_plan(N, P, S, jnp.float32)
    assert spw % sb == 0 and spw // sb >= 2, "must engage >= 2 column blocks"
    assert N // rows >= 2, "must engage >= 2 row blocks"
    h = jnp.asarray(rng.randn(T, B, P).astype(np.float32) * 0.2)
    W = jnp.asarray(rng.randn(P, S).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(S).astype(np.float32))
    tc = rng.randint(-1, S, (T, B)).astype(np.int32)
    tc2 = jnp.asarray(tc).reshape(N, 1)
    bias_mult = 1.0

    def composed(h, W, b):
        a = feedforward_forward({"W": W, "b": b}, h, "identity", bias_mult)
        return _ref(a, jnp.asarray(tc))

    def fused(h, W, b):
        return softmax_ce_wide_fused(
            h.reshape(N, P), jnp.pad(W, ((0, 0), (0, spw - S))),
            jnp.pad(b, (0, spw - S)), tc2, S, bias_mult, True, jnp.float32)

    loss_r, cnt_r = composed(h, W, b)
    loss_f, cnt_f = fused(h, W, b)
    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-6)
    assert int(cnt_f) == int(cnt_r)

    g_r = jax.grad(lambda *a: composed(*a)[0], argnums=(0, 1, 2))(h, W, b)
    g_f = jax.grad(lambda *a: fused(*a)[0], argnums=(0, 1, 2))(h, W, b)
    for r, f, name in zip(g_r, g_f, ("dh", "dW", "db")):
        rr = np.asarray(r)
        ff = np.asarray(f).reshape(-1)[:rr.size].reshape(rr.shape)
        scale = float(np.abs(rr).max()) or 1.0
        np.testing.assert_allclose(ff, rr, rtol=0, atol=1e-5 * scale,
                                   err_msg=name)
    # padded columns of dW/db receive exactly zero gradient
    dW_f, db_f = np.asarray(g_f[1]), np.asarray(g_f[2])
    assert not dW_f[:, S:].any() and not db_f[S:].any()


def test_wide_plan_blocks_fit_budget():
    from lstm_rnn_tpu.ops.softmax_ce import _VMEM_BUDGET, wide_plan

    for p, s in ((512, 10112), (512, 32000), (1024, 10112), (128, 1500)):
        spw, sb, rows = wide_plan(32768, p, s, jnp.bfloat16)
        assert spw % sb == 0 and spw >= s and 32768 % rows == 0
        assert p * sb * 4 + rows * (sb * (2 * 2 + 20) + p * 2) \
            <= _VMEM_BUDGET


def test_vmem_row_caps_and_proj_fits(tmp_path, monkeypatch):
    """Wide softmax layers (LVCSR-scale state counts) must shrink the tail
    kernels' row blocks / reject the proj-fused variant instead of failing
    at device compile with a Mosaic scoped-VMEM overflow; the flagship
    shapes must keep their measured block sizes."""
    from lstm_rnn_tpu.ops import vmem_probe as vp
    from lstm_rnn_tpu.ops.softmax_ce import (_PROJ_ROWS, _ROWS, _proj_rows,
                                             _row_block, proj_tail_fits)

    # isolate from the real user probe cache and the shipped defaults —
    # these assertions pin the ANALYTIC model, which a host's recorded
    # device verdicts would otherwise override
    monkeypatch.setenv("LSTM_RNN_TPU_PROBE_CACHE",
                       str(tmp_path / "probe.json"))
    monkeypatch.setattr(vp, "_MEM", None)
    monkeypatch.setattr(vp, "_device_kind", lambda: "fake_tpu")

    # flagship: Sp=256 keeps the full measured blocks
    assert _row_block(32768, 256) == _ROWS
    assert _proj_rows(32768, 512, 256, jnp.bfloat16) == _PROJ_ROWS
    assert proj_tail_fits(32000, 512, 256, jnp.bfloat16)
    assert proj_tail_fits(32000, 512, 256, jnp.float32)

    # wide state counts: rows shrink with Sp but stay positive and divide N
    for sp in (1536, 4096, 10112):
        r = _row_block(32768, sp)
        assert r >= 1 and 32768 % r == 0
        assert r * sp * 4 * 6 <= 12 * 1024 * 1024

    # LVCSR-scale proj tail cannot fit its [P, Sp] W/dW blocks -> falls back
    assert not proj_tail_fits(32768, 512, 10112, jnp.bfloat16)
    assert not proj_tail_fits(32768, 512, 10112, jnp.float32)


def test_fused_tail_wide_softmax_matches_composed(rng):
    """A state count wide enough to engage the VMEM row cap (rows bound by
    Sp, not by N's divisibility) still matches the composed reference."""
    from lstm_rnn_tpu.ops.softmax_ce import _row_block

    T, B, S = 32, 32, 600  # Sp=640: row cap 512 < N=1024
    Sp = -(-S // 128) * 128
    assert _row_block(T * B, Sp) < T * B
    a = jnp.asarray(rng.randn(T, B, S).astype(np.float32) * 3)
    tc = rng.randint(-1, S, (T, B)).astype(np.int32)
    tc_j = jnp.asarray(tc)

    loss_r, cnt_r = _ref(a, tc_j)
    a2 = jnp.pad(a, ((0, 0), (0, 0), (0, Sp - S))).reshape(T * B, Sp)
    tc2 = tc_j.reshape(T * B, 1)
    loss_f, cnt_f = softmax_ce_fused(a2, tc2, S, True, jnp.float32)
    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-6)
    assert int(cnt_f) == int(cnt_r)

    g_r = jax.grad(lambda a: _ref(a, tc_j)[0])(a)
    g_f = jax.grad(lambda a: softmax_ce_fused(
        jnp.pad(a, ((0, 0), (0, 0), (0, Sp - S))).reshape(T * B, Sp),
        tc2, S, True, jnp.float32)[0])(a)
    scale = float(jnp.abs(g_r).max())
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=0, atol=1e-6 * scale)


def test_loss_and_count_fused_wide_softmax_fallback(rng):
    """Network.loss_and_count_fused on a net whose softmax is too wide for
    the proj-fused kernels must take the WIDE tail (Sp-column-blocked
    backward; round 3 fell back to materialized logits here) and still
    match the unfused apply + loss_fn path."""
    from lstm_rnn_tpu.network import Network

    from lstm_rnn_tpu.ops.softmax_ce import proj_tail_fits

    # P=128 (the blstm width) is lane-aligned, so only the fits gate keeps
    # this off the proj path: Sp=8192 makes the [P, Sp] W + dW blocks alone
    # exceed the scoped-VMEM budget
    S = 8100
    assert not proj_tail_fits(8 * 4, 128, 8192, jnp.float32)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 128, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": S, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": S},
    ]
    net = Network(layers, backend="pallas_interpret")
    net.init_params(5)
    t, b = 8, 4
    x = jnp.asarray(rng.randn(t, b, 3).astype(np.float32))
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths
    pt = jnp.asarray(pattypes_from_lengths([8, 6, 8, 5], t, b))
    tc = rng.randint(0, S, (t, b)).astype(np.int32)
    tc[np.asarray(pt) == 0] = -1
    tc = jnp.asarray(tc)

    loss_f, cnt_f = net.loss_and_count_fused(net.params, x, tc, pt,
                                             interpret=True)
    y = net.apply(net.params, x, pt)
    loss_r = net.loss_fn(y, tc, pt)
    cnt_r = net.correct_count(y, tc, pt)
    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-5)
    assert int(cnt_f) == int(cnt_r)


def test_fused_tail_through_trainer(rng, tmp_path):
    """Trainer with backend=pallas_interpret engages the fused tail; the
    trained network must match the scan/unfused trainer closely."""
    from .test_data import _write_classification_nc
    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.trainer import Trainer

    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [10, 8, 12, 9], in_size=3, num_labels=5,
                             seed=3)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 5, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 5},
    ]
    ds = DataSet([nc], parallel_sequences=2, sort_by_length=True,
                 prefetch=False)

    net1 = Network(layers, backend="scan")
    net1.init_params(5)
    t1 = Trainer(net1, ds, learning_rate=1e-3, momentum=0.9, max_epochs=2,
                 hybrid_online_batch=True, padded_pipeline=False)
    while not t1.train_epoch():
        pass

    net2 = Network(layers, backend="pallas_interpret")
    net2.init_params(5)
    t2 = Trainer(net2, ds, learning_rate=1e-3, momentum=0.9, max_epochs=2,
                 hybrid_online_batch=True, padded_pipeline=True)
    assert t2.padded
    while not t2.train_epoch():
        pass

    assert t1.cur_training_error == pytest.approx(t2.cur_training_error,
                                                  rel=1e-4)
    assert t1.cur_training_class_error == t2.cur_training_class_error
    p1, p2 = t1.exact_params(), t2.exact_params()
    for name in p1:
        for kk in p1[name]:
            np.testing.assert_allclose(p2[name][kk], p1[name][kk],
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{name}.{kk}")


def test_wide_tail_through_trainer(rng, tmp_path):
    """Trainer with backend=pallas_interpret and an LVCSR-scale softmax
    engages the WIDE fused tail through the padded pipeline; the trained
    network must match the scan/unfused trainer closely."""
    from .test_data import _write_classification_nc
    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.ops.softmax_ce import proj_tail_fits
    from lstm_rnn_tpu.trainer import Trainer

    S = 4200  # proj tail rejected at P=256 ([P,Sp] W/dW blocks alone
    # exceed the scoped-VMEM budget), the wide plan engages
    assert not proj_tail_fits(64, 256, 4352, jnp.float32)
    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [10, 8, 12, 9], in_size=3, num_labels=S,
                             seed=3)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": S, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification",
         "size": S},
    ]
    ds = DataSet([nc], parallel_sequences=2, sort_by_length=True,
                 prefetch=False)

    net1 = Network(layers, backend="scan")
    net1.init_params(5)
    t1 = Trainer(net1, ds, learning_rate=1e-3, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, padded_pipeline=False)
    while not t1.train_epoch():
        pass

    net2 = Network(layers, backend="pallas_interpret")
    net2.init_params(5)
    t2 = Trainer(net2, ds, learning_rate=1e-3, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, padded_pipeline=True)
    assert t2.padded
    while not t2.train_epoch():
        pass

    assert t1.cur_training_error == pytest.approx(t2.cur_training_error,
                                                  rel=1e-4)
    assert t1.cur_training_class_error == t2.cur_training_class_error
    p1, p2 = t1.exact_params(), t2.exact_params()
    for name in p1:
        for kk in p1[name]:
            np.testing.assert_allclose(p2[name][kk], p1[name][kk],
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{name}.{kk}")
