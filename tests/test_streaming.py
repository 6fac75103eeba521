"""Streaming inference (Network.apply_streaming): chunked forward with
carried (h, c) must equal the whole-sequence forward exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.network import Network
from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

UNI_LAYERS = [
    {"name": "input", "type": "input", "size": 3},
    {"name": "l1", "type": "lstm", "size": 5, "bias": 1.0},
    {"name": "ff", "type": "feedforward_tanh", "size": 6, "bias": 0.5},
    {"name": "l2", "type": "lstm", "size": 4, "bias": 1.0},
    {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
    {"name": "post", "type": "multiclass_classification", "size": 4},
]


@pytest.mark.parametrize("chunks", [[4, 4, 4], [1, 5, 3, 3], [12]])
def test_streaming_matches_whole_sequence(rng, chunks):
    net = Network(UNI_LAYERS, backend="scan")
    net.init_params(11)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    t, b = sum(chunks), 3
    x = jnp.asarray(rng.uniform(-1, 1, (t, b, 3)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([t, t - 2, 4], t, b))

    y_ref = net.apply(params, x, pt)

    step = jax.jit(net.apply_streaming)
    state = net.init_stream_state(b)
    outs, lo = [], 0
    for c in chunks:
        y, state = step(params, x[lo:lo + c], pt[lo:lo + c], state)
        outs.append(y)
        lo += c
    y_stream = jnp.concatenate(outs, axis=0)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("chunks", [[4, 4, 4], [1, 5, 3, 3]])
def test_streaming_fused_kernel_matches_scan(rng, chunks):
    """backend=pallas_interpret routes apply_streaming chunks through the
    carry-capable fused kernel (lstm_scan_fused_carry) — outputs and the
    carried state must match the scan streaming path and the whole-sequence
    apply (VERDICT r3 item #3)."""
    net = Network(UNI_LAYERS, backend="pallas_interpret")
    net.init_params(11)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    t, b = sum(chunks), 3
    x = jnp.asarray(rng.uniform(-1, 1, (t, b, 3)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([t, t - 2, 4], t, b))

    net_ref = Network(UNI_LAYERS, backend="scan")
    net_ref.params = net.params
    y_ref = net_ref.apply(params, x, pt)

    state = net.init_stream_state(b)
    state_ref = net_ref.init_stream_state(b)
    outs, lo = [], 0
    for c in chunks:
        y, state = net.apply_streaming(params, x[lo:lo + c],
                                       pt[lo:lo + c], state)
        _, state_ref = net_ref.apply_streaming(params, x[lo:lo + c],
                                               pt[lo:lo + c], state_ref)
        outs.append(y)
        lo += c
    y_stream = jnp.concatenate(outs, axis=0)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    # the carried state stays interchangeable with the scan path's
    for name in state:
        for got, want in zip(state[name], state_ref[name]):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)


def test_streaming_state_resets_on_sequence_end(rng):
    """A NONE slot zeroes the carried state (exactly as the whole-sequence
    mask does), so a new sequence started in a later chunk sees zero
    initial state — chunk boundaries never leak state across sequences."""
    net = Network(UNI_LAYERS, backend="scan")
    net.init_params(7)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    b = 1
    # sequence A (4 frames), 2 NONE frames, then the streaming state must
    # be zero — equal to a fresh state
    xa = jnp.asarray(rng.uniform(-1, 1, (6, b, 3)), jnp.float32)
    pta = jnp.asarray(pattypes_from_lengths([4], 6, b))
    state = net.init_stream_state(b)
    _, state = net.apply_streaming(params, xa, pta, state)
    fresh = net.init_stream_state(b)
    for name in state:
        for got, want in zip(state[name], fresh[name]):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_streaming_scan_backend_gradients_match_whole_sequence(rng):
    """Truncated-BPTT over streamed chunks (library-level, scan backend):
    differentiating the chunked forward with the carry flowing between
    chunks must equal the whole-sequence gradient — including a mid-run
    sequence end whose NONE gap resets the carried state. The FUSED
    streaming path stays inference-only (its per-step-mask backward
    raises by design); this pins the documented scan-backend alternative
    (README "Streaming inference")."""
    from lstm_rnn_tpu.models.lstm import lstm_forward, lstm_forward_streaming

    T, B, P, h = 12, 2, 3, 4
    params = {
        "W_in": jnp.asarray(rng.uniform(-1, 1, (1, P, 4, h)), jnp.float32),
        "W_rec": jnp.asarray(rng.uniform(-1, 1, (1, h, 4, h)), jnp.float32),
        "b": jnp.asarray(rng.uniform(-1, 1, (1, 4, h)), jnp.float32),
        "peep": jnp.asarray(rng.uniform(-1, 1, (1, 3, h)), jnp.float32),
    }
    x = jnp.asarray(rng.uniform(-1, 1, (T, B, P)), jnp.float32)
    # stream 0 runs the full 12 frames; stream 1's sequence ends at frame
    # 5 and a new one starts at frame 8 (mid-chunk boundary for [5, 4, 3])
    pt_np = np.array(pattypes_from_lengths([T, 5], T, B))
    # frames 8-11 of stream 1: a fresh 4-frame sequence (FIRST, NORMAL,
    # NORMAL, LAST) after the NONE gap at frames 5-7
    pt_np[8:, 1] = [1, 2, 2, 3]
    pt = jnp.asarray(pt_np)

    def whole(p):
        y = lstm_forward(p, x, pt, 1.0, False, backend="scan")
        return jnp.sum(y ** 2)

    def chunked(p):
        state = (jnp.zeros((1, B, h)), jnp.zeros((1, B, h)))
        total = 0.0
        off = 0
        for n in [5, 4, 3]:
            y, state = lstm_forward_streaming(
                p, x[off:off + n], pt[off:off + n], 1.0, state,
                backend="scan")
            total = total + jnp.sum(y ** 2)
            off += n
        return total

    np.testing.assert_allclose(float(whole(params)), float(chunked(params)),
                               rtol=1e-6)
    g_whole = jax.grad(whole)(params)
    g_chunk = jax.grad(chunked)(params)
    for k in g_whole:
        np.testing.assert_allclose(np.asarray(g_chunk[k]),
                                   np.asarray(g_whole[k]), rtol=2e-5,
                                   atol=1e-6)


def test_streaming_float64_params(rng):
    """init_stream_state's carry dtype must follow the param dtype: under
    jax_enable_x64 with f64 params the scan carry is f64, and a hardcoded
    f32 zero state would die with a carry dtype mismatch on chunk 1."""
    with jax.enable_x64():
        net = Network(UNI_LAYERS, backend="scan")
        net.init_params(5)
        net.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), net.params)
        t, b = 8, 2
        x = jnp.asarray(rng.uniform(-1, 1, (t, b, 3)), jnp.float64)
        pt = jnp.asarray(pattypes_from_lengths([t, 5], t, b))
        y_ref = net.apply(net.params, x, pt)
        state = net.init_stream_state(b)
        outs = []
        for lo in range(0, t, 4):
            y, state = net.apply_streaming(net.params, x[lo:lo + 4],
                                           pt[lo:lo + 4], state)
            outs.append(y)
        # not assert_array_equal: the compute path casts x/w to f32
        # (compute_dtype) and XLA may fuse those intermediates differently
        # across the two program shapes — ~1e-11 noise, not carried state
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(outs, axis=0)), np.asarray(y_ref),
            rtol=1e-9, atol=1e-9)


def test_scan_rejects_return_carry_with_remat(rng):
    """return_carry + remat_blocks must raise (the remat pad steps would
    zero a returned carry) — a hard ValueError, not an -O-strippable
    assert, since silent tuple-unpack of the array return would propagate
    garbage state."""
    from lstm_rnn_tpu.models.lstm import _lstm_scan
    acts = jnp.zeros((6, 1, 2, 4, 3))
    w_rec = jnp.zeros((1, 3, 4, 3))
    peep = jnp.zeros((1, 3, 3))
    mask = jnp.ones((6, 1, 2, 1))
    init = (jnp.zeros((1, 2, 3)), jnp.zeros((1, 2, 3)))
    with pytest.raises(ValueError, match="return_carry"):
        _lstm_scan(acts, w_rec, peep, mask, True, init=init,
                   return_carry=True, remat_blocks=3)


def test_streaming_rejects_bidirectional():
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "b1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "post", "type": "multiclass_classification", "size": 4},
    ]
    net = Network(layers)
    net.init_params(3)
    with pytest.raises(ValueError, match="bidirectional"):
        net.init_stream_state(2)


def test_streaming_fused_mid_chunk_boundaries(rng):
    """Chunks where one sequence ENDS and another STARTS inside the same
    chunk (mid-chunk NONE gaps, suffix-valid rows) — the fused path must
    match scan exactly in semantics: state zeroed at each NONE step, the
    new sequence started from zero state, trailing real frames after a
    gap NOT dropped. (A prefix-lengths reduction fails all three.)"""
    from lstm_rnn_tpu.ops.masking import (PATTYPE_FIRST, PATTYPE_LAST,
                                          PATTYPE_NONE, PATTYPE_NORMAL)
    net = Network(UNI_LAYERS, backend="pallas_interpret")
    net.init_params(19)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    t, b = 12, 3
    x = jnp.asarray(rng.uniform(-1, 1, (t, b, 3)), jnp.float32)
    pt = np.full((t, b), PATTYPE_NONE, np.int8)
    # row 0: seq A (4 frames), 2-frame gap, seq B (6 frames) — the gap and
    # restart land inside chunk 1 of a [4, 4, 4] chunking
    pt[:4, 0] = [PATTYPE_FIRST, PATTYPE_NORMAL, PATTYPE_NORMAL, PATTYPE_LAST]
    pt[6:, 0] = [PATTYPE_FIRST] + [PATTYPE_NORMAL] * 4 + [PATTYPE_LAST]
    # row 1: starts mid-stream (suffix validity)
    pt[5:, 1] = [PATTYPE_FIRST] + [PATTYPE_NORMAL] * 5 + [PATTYPE_LAST]
    # row 2: plain prefix
    pt[:7, 2] = [PATTYPE_FIRST] + [PATTYPE_NORMAL] * 5 + [PATTYPE_LAST]
    pt = jnp.asarray(pt)

    net_ref = Network(UNI_LAYERS, backend="scan")
    net_ref.params = net.params

    state = net.init_stream_state(b)
    state_ref = net_ref.init_stream_state(b)
    outs, outs_ref = [], []
    for lo in range(0, t, 4):
        y, state = net.apply_streaming(params, x[lo:lo + 4],
                                       pt[lo:lo + 4], state)
        yr, state_ref = net_ref.apply_streaming(params, x[lo:lo + 4],
                                                pt[lo:lo + 4], state_ref)
        outs.append(y)
        outs_ref.append(yr)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=0)),
        np.asarray(jnp.concatenate(outs_ref, axis=0)),
        rtol=2e-5, atol=2e-5)
    for name in state:
        for got, want in zip(state[name], state_ref[name]):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)


def test_streaming_explicit_pallas_unfit_raises(monkeypatch):
    """On a real TPU, an explicit lstm_backend=pallas streaming request
    that fails the VMEM model or a recorded device probe verdict must
    raise the same clear error lstm_forward gives — not silently downgrade
    to a ~3x slower scan or die in Mosaic at device compile."""
    import lstm_rnn_tpu.models.lstm as ml

    monkeypatch.setattr(ml.jax, "default_backend", lambda: "tpu")

    # analytic-unfit
    monkeypatch.setattr("lstm_rnn_tpu.ops.lstm_cell.fused_fits",
                        lambda *a, **k: False)
    with pytest.raises(ValueError, match="VMEM model"):
        ml._resolve_fused("pallas", 128, 128, 16, jnp.float32)
    # auto still falls back silently
    assert ml._resolve_fused("auto", 128, 128, 16, jnp.float32)[0] is False

    # device-verdict-unfit (analytic fits)
    monkeypatch.setattr("lstm_rnn_tpu.ops.lstm_cell.fused_fits",
                        lambda *a, **k: True)
    monkeypatch.setattr("lstm_rnn_tpu.ops.vmem_probe.known_unfit",
                        lambda *a, **k: True)
    with pytest.raises(ValueError, match="device probe verdict"):
        ml._resolve_fused("pallas", 128, 128, 16, jnp.float32)
    assert ml._resolve_fused("auto", 128, 128, 16, jnp.float32)[0] is False


def test_streaming_interpret_ignores_vmem_model(monkeypatch):
    """Interpret mode has no VMEM constraint: an explicit pallas_interpret
    request (or explicit pallas off-TPU, which runs interpreted) must run
    the kernel even when the analytic model says no chunk fits — silently
    downgrading to scan would make a CPU parity test of a wide layer
    compare scan against scan, proving nothing."""
    import lstm_rnn_tpu.models.lstm as ml

    monkeypatch.setattr("lstm_rnn_tpu.ops.lstm_cell.fused_fits",
                        lambda *a, **k: False)
    # pallas_interpret anywhere
    assert ml._resolve_fused(
        "pallas_interpret", 128, 128, 16, jnp.float32) == (True, True)
    # explicit pallas off-TPU runs interpreted
    monkeypatch.setattr(ml.jax, "default_backend", lambda: "cpu")
    assert ml._resolve_fused(
        "pallas", 128, 128, 16, jnp.float32) == (True, True)
