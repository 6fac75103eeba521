"""Pipeline parallelism (parallel/pipeline.py): loss, counters and
gradients over a virtual "pipe" mesh must match the single-device network.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.network import Network
from lstm_rnn_tpu.ops.masking import pattypes_from_lengths
from lstm_rnn_tpu.parallel.mesh import make_mesh
from lstm_rnn_tpu.parallel.pipeline import (loss_and_count_pipelined,
                                            stage_ranges)

LAYERS = [
    {"name": "input", "type": "input", "size": 3},
    {"name": "b1", "type": "blstm", "size": 4, "bias": 1.0},
    {"name": "ff", "type": "feedforward_tanh", "size": 6, "bias": 0.5},
    {"name": "b2", "type": "lstm", "size": 5, "bias": 1.0},
    {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
    {"name": "post", "type": "multiclass_classification", "size": 4},
]


def _net_and_batch(rng, b=8, t=7):
    net = Network(LAYERS)
    net.init_params(11)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    x = jnp.asarray(rng.uniform(-1, 1, (t, b, 3)), jnp.float32)
    lens = [t] * (b // 2) + [max(1, t - 2)] * (b - b // 2)
    pt = jnp.asarray(pattypes_from_lengths(lens, t, b))
    tc = jnp.asarray(rng.randint(0, 4, (t, b)), jnp.int32)
    return net, params, x, tc, pt


def test_stage_ranges():
    assert stage_ranges(4, 2) == [(0, 2), (2, 4)]
    assert stage_ranges(5, 2) == [(0, 2), (2, 5)] or \
        stage_ranges(5, 2) == [(0, 3), (3, 5)]
    assert stage_ranges(4, 4) == [(0, 1), (1, 2), (2, 3), (3, 4)]
    with pytest.raises(ValueError):
        stage_ranges(2, 3)


@pytest.mark.parametrize("n_pipe", [2, 4])
def test_pipelined_matches_single_device(rng, n_pipe):
    net, params, x, tc, pt = _net_and_batch(rng)
    mesh = make_mesh(n_pipe, axis="pipe")

    def ref(p):
        y = net.apply(p, x, pt)
        return net.loss_fn(y, tc, pt), net.correct_count(y, tc, pt)

    def pipe(p):
        return loss_and_count_pipelined(net, p, x, tc, pt, mesh)

    (e_ref, c_ref), g_ref = jax.value_and_grad(ref, has_aux=True)(params)
    (e_pp, c_pp), g_pp = jax.value_and_grad(pipe, has_aux=True)(params)
    np.testing.assert_allclose(float(e_pp), float(e_ref), rtol=1e-6)
    assert int(c_pp) == int(c_ref)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b_ in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-5, atol=1e-6)


def test_pipelined_ragged_batch(rng):
    """B not divisible by the stage count pads with inert PATTYPE_NONE
    columns — results still match."""
    net, params, x, tc, pt = _net_and_batch(rng, b=7)
    mesh = make_mesh(2, axis="pipe")
    y = net.apply(params, x, pt)
    e_ref = float(net.loss_fn(y, tc, pt))
    c_ref = int(net.correct_count(y, tc, pt))
    e_pp, c_pp = jax.jit(
        lambda p: loss_and_count_pipelined(net, p, x, tc, pt, mesh))(params)
    np.testing.assert_allclose(float(e_pp), e_ref, rtol=1e-6)
    assert int(c_pp) == c_ref


def test_dp_x_pp_matches_single_device(rng):
    """A 2-D ('data', 'pipe') mesh: B sharded over 'data', GPipe stages
    within each data shard — loss, counters and gradients still match the
    single-device network."""
    from lstm_rnn_tpu.parallel.mesh import make_mesh_2d, replicate, \
        shard_fraction

    net, params, x, tc, pt = _net_and_batch(rng, b=8)
    mesh = make_mesh_2d(8, 2, data_axis="data", model_axis="pipe")
    params_r = replicate(mesh, params)
    xs, tcs, pts = shard_fraction(mesh, x, tc, pt)

    def ref(p):
        y = net.apply(p, x, pt)
        return net.loss_fn(y, tc, pt), net.correct_count(y, tc, pt)

    def pipe(p, xx, tt, pp_):
        return loss_and_count_pipelined(net, p, xx, tt, pp_, mesh)

    (e_ref, c_ref), g_ref = jax.value_and_grad(ref, has_aux=True)(params)
    (e_pp, c_pp), g_pp = jax.jit(jax.value_and_grad(
        pipe, has_aux=True))(params_r, xs, tcs, pts)
    np.testing.assert_allclose(float(e_pp), float(e_ref), rtol=1e-6)
    assert int(c_pp) == int(c_ref)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b_ in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-5, atol=1e-6)


def test_pipelined_padded_view_matches_exact(rng):
    """padded=True routes stages through the padded training view
    (apply_padded_layer_range) — loss, counters and padded gradients must
    match the single-device padded path."""
    net, params, x, tc, pt = _net_and_batch(rng)
    net.backend = "pallas_interpret"
    pp_params = jax.tree_util.tree_map(
        jnp.asarray, net.pad_params(net.params))
    mesh = make_mesh(2, axis="pipe")

    def ref(p):
        y = net.apply_padded(p, x, pt)
        return net.loss_fn(y, tc, pt), net.correct_count(y, tc, pt)

    def pipe(p):
        return loss_and_count_pipelined(net, p, x, tc, pt, mesh,
                                        padded=True)

    (e_ref, c_ref), g_ref = jax.value_and_grad(ref, has_aux=True)(pp_params)
    (e_pp, c_pp), g_pp = jax.value_and_grad(pipe, has_aux=True)(pp_params)
    np.testing.assert_allclose(float(e_pp), float(e_ref), rtol=1e-6)
    assert int(c_pp) == int(c_ref)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b_ in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-5, atol=1e-6)


def test_pipelined_more_microbatches(rng):
    """microbatches > stage count (bubble amortization) keeps results
    equal to the single-device network."""
    net, params, x, tc, pt = _net_and_batch(rng, b=8)
    mesh = make_mesh(2, axis="pipe")
    y = net.apply(params, x, pt)
    e_ref, c_ref = float(net.loss_fn(y, tc, pt)), int(
        net.correct_count(y, tc, pt))
    e_pp, c_pp = jax.jit(lambda p: loss_and_count_pipelined(
        net, p, x, tc, pt, mesh, microbatches=4))(params)
    np.testing.assert_allclose(float(e_pp), e_ref, rtol=1e-6)
    assert int(c_pp) == c_ref


def test_pp_inside_fused_fraction_scan(tmp_path):
    """--pipeline_devices composes with --fuse_fractions: the grouped
    lax.scan whose body contains the shard_map pipeline still trains
    identically to per-fraction single-device stepping."""
    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.trainer import Trainer

    from .test_data import _write_classification_nc

    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [6, 5, 4, 7], in_size=3, num_labels=4,
                             seed=3)

    def run(fuse, pipe):
        ds = DataSet([nc], parallel_sequences=2, sort_by_length=True,
                     prefetch=False, seed=1)
        net = Network(LAYERS[:2] + LAYERS[-2:])  # input, b1, output, post
        net.init_params(5)
        pm = make_mesh(2, axis="pipe") if pipe else None
        tr = Trainer(net, ds, learning_rate=1e-3, momentum=0.9,
                     max_epochs=2, hybrid_online_batch=True,
                     fuse_fractions=fuse, pipe_mesh=pm, device_cache=False)
        while not tr.train_epoch():
            pass
        return tr.exact_params()

    flat_a, _ = jax.tree_util.tree_flatten(run(1, False))
    flat_b, _ = jax.tree_util.tree_flatten(run(4, True))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("padded", [False, True])
def test_apply_pipelined_matches_apply(rng, padded):
    """apply_pipelined (inference/serving forward over stages) returns the
    same [T, B, out] activations as the single-device forward, exact and
    padded views, including ragged B."""
    from lstm_rnn_tpu.parallel.pipeline import apply_pipelined

    net, params, x, tc, pt = _net_and_batch(rng, b=7)
    mesh = make_mesh(2, axis="pipe")
    if padded:
        net.backend = "pallas_interpret"
        p_run = jax.tree_util.tree_map(jnp.asarray,
                                       net.pad_params(net.params))
        y_ref = net.apply_padded(p_run, x, pt)
    else:
        p_run = params
        y_ref = net.apply(p_run, x, pt)
    y_pp = jax.jit(lambda p: apply_pipelined(
        net, p, x, pt, mesh, padded=padded))(p_run)
    assert y_pp.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_pipelined_reduces_per_device_backward_memory(rng):
    """GPipe-standard per-microbatch rematerialization: per-device
    backward temp memory must come out well BELOW the unpipelined
    network's (XLA memory_analysis). Guards the jax.checkpoint around
    the tick — without it the tick scan stores every tick's stage
    residuals and pipelining costs MORE memory than it saves."""
    layers = [
        {"name": "input", "type": "input", "size": 8},
        {"name": "b1", "type": "blstm", "size": 16, "bias": 1.0},
        {"name": "b2", "type": "blstm", "size": 16, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 5, "bias": 1.0},
        {"name": "post", "type": "multiclass_classification", "size": 5},
    ]
    net = Network(layers)
    net.init_params(3)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    t, b = 256, 8
    x = jnp.zeros((t, b, 8), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([t] * b, t, b))
    tc = jnp.zeros((t, b), jnp.int32)
    mesh = make_mesh(3, axis="pipe")

    def ref(p):
        return net.loss_fn(net.apply(p, x, pt), tc, pt)

    def pp(p):
        return loss_and_count_pipelined(net, p, x, tc, pt, mesh,
                                        microbatches=4)[0]

    temp = {}
    for name, fn in (("single", ref), ("pipe", pp)):
        c = jax.jit(jax.grad(fn)).lower(params).compile()
        temp[name] = c.memory_analysis().temp_size_in_bytes
    # measured ~5x at these shapes; assert a conservative 2x
    assert temp["pipe"] * 2 < temp["single"], temp
