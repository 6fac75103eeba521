"""Multi-chip data parallelism: sharded training equals single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh
from lstm_rnn_tpu.data.dataset import DataSet
from lstm_rnn_tpu.network import Network
from lstm_rnn_tpu.parallel.mesh import make_mesh, replicate, shard_fraction
from lstm_rnn_tpu.trainer import Trainer

from .conftest import requires_reference

NC = "/root/reference/examples/speech_recognition_chime/val_1_speaker.nc"
NET = "/root/reference/tests/test1/network.jsn"


def test_mesh_devices():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh()
    assert mesh.devices.size == 8


@requires_reference
def test_sharded_training_matches_single_device():
    """One stochastic epoch with B=8 sharded over 8 devices must produce the
    same updates as unsharded training (the psum is the same pattern sum)."""
    ds = DataSet([NC], parallel_sequences=8, fraction=0.16,
                 sort_by_length=True, prefetch=False)
    net = Network.from_json_file(NET)

    t1 = Trainer(net, ds, learning_rate=1e-5, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True)
    t1.train_epoch()

    net2 = Network.from_json_file(NET)
    mesh = make_mesh()
    t2 = Trainer(net2, ds, learning_rate=1e-5, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, mesh=mesh)
    t2.train_epoch()

    assert abs(t1.cur_training_error - t2.cur_training_error) < 1e-5 * abs(
        t1.cur_training_error) + 1e-8
    for name in t1.params:
        for kk in t1.params[name]:
            a = np.asarray(t1.params[name][kk])
            b = np.asarray(t2.params[name][kk])
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                       err_msg=f"{name}.{kk}")


@requires_reference
def test_sharded_fused_training_matches():
    """Mesh sharding + fused multi-fraction scans together."""
    ds = DataSet([NC], parallel_sequences=8, fraction=0.24,
                 sort_by_length=True, prefetch=False, bucket_lengths=True)
    net1 = Network.from_json_file(NET)
    t1 = Trainer(net1, ds, learning_rate=1e-5, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True)
    t1.train_epoch()

    net2 = Network.from_json_file(NET)
    t2 = Trainer(net2, ds, learning_rate=1e-5, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, mesh=make_mesh(), fuse_fractions=3)
    t2.train_epoch()

    assert abs(t1.cur_training_error - t2.cur_training_error) < (
        1e-5 * abs(t1.cur_training_error) + 1e-8)
    for name in t1.params:
        for kk in t1.params[name]:
            np.testing.assert_allclose(
                np.asarray(t1.params[name][kk]), np.asarray(t2.params[name][kk]),
                rtol=1e-5, atol=1e-7, err_msg=f"{name}.{kk}")


def test_sharded_fused_nondividing_mesh(tmp_path):
    """Mesh sizes that do not divide the 8-sublane padding granule (here 3)
    must work with fuse_fractions: the fused path has to pad B to
    lcm(8, mesh) like the unfused path (regression: trainer.py flush()
    used the default granule and shard_fraction raised)."""
    from .test_data import _write_classification_nc

    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [6, 5, 4, 7, 3, 6, 5, 4], in_size=3,
                             num_labels=4, seed=11)
    net_doc = {
        "layers": [
            {"name": "input", "type": "input", "size": 3},
            {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification", "size": 4},
        ],
    }
    ds = DataSet([nc], parallel_sequences=4, sort_by_length=True,
                 prefetch=False)

    net1 = Network(net_doc["layers"])
    net1.init_params(5)
    t1 = Trainer(net1, ds, learning_rate=1e-3, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True)
    t1.train_epoch()

    net2 = Network(net_doc["layers"])
    net2.init_params(5)
    t2 = Trainer(net2, ds, learning_rate=1e-3, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, mesh=make_mesh(3), fuse_fractions=2)
    t2.train_epoch()

    assert abs(t1.cur_training_error - t2.cur_training_error) < (
        1e-5 * abs(t1.cur_training_error) + 1e-8)
    for name in t1.params:
        for kk in t1.params[name]:
            np.testing.assert_allclose(
                np.asarray(t1.params[name][kk]), np.asarray(t2.params[name][kk]),
                rtol=1e-5, atol=1e-7, err_msg=f"{name}.{kk}")


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    y = jax.jit(fn)(*args)
    assert y.shape == (64, 8, 183)
    assert bool(jnp.isfinite(y).all())


@pytest.mark.parametrize("bidirectional", [False, True])
def test_tensor_parallel_lstm_matches_single_device(rng, bidirectional):
    """Megatron-style cell sharding over a "model" mesh axis: forward and
    all parameter gradients must equal the single-device scan path (the
    per-step all_gather / backward reduce_scatter is the same sum)."""
    from lstm_rnn_tpu.models.lstm import lstm_forward
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths
    from lstm_rnn_tpu.parallel.tensor import lstm_forward_tp, shard_lstm_params

    T, B, P, L = 11, 4, 5, 32  # h = 16 (or 32 uni) divides the 8-way axis
    d = 2 if bidirectional else 1
    h = L // d
    params = {
        "W_in": jnp.asarray(rng.uniform(-1, 1, (d, P, 4, h)), jnp.float32),
        "W_rec": jnp.asarray(rng.uniform(-1, 1, (d, h, 4, h)), jnp.float32),
        "b": jnp.asarray(rng.uniform(-1, 1, (d, 4, h)), jnp.float32),
        "peep": jnp.asarray(rng.uniform(-1, 1, (d, 3, h)), jnp.float32),
    }
    x = jnp.asarray(rng.uniform(-1, 1, (T, B, P)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([11, 6, 9, 4], T, B))
    dy = jnp.asarray(rng.uniform(-2, 2, (T, B, L)), jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    p_sh = shard_lstm_params(mesh, params)

    def loss_ref(p):
        return jnp.sum(lstm_forward(p, x, pt, 1.0, bidirectional,
                                    backend="scan") * dy)

    def loss_tp(p):
        return jnp.sum(lstm_forward_tp(p, x, pt, 1.0, bidirectional,
                                       mesh) * dy)

    (l_ref, g_ref) = jax.value_and_grad(loss_ref)(params)
    (l_tp, g_tp) = jax.value_and_grad(jax.jit(loss_tp))(p_sh)
    assert float(l_tp) == pytest.approx(float(l_ref), rel=1e-5)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_tp[k]), np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_tensor_parallel_composes_with_data_parallel(rng):
    """2-D mesh: B sharded on "data" (4) x cells sharded on "model" (2) must
    still equal the single-device cell."""
    from lstm_rnn_tpu.models.lstm import lstm_forward
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths
    from lstm_rnn_tpu.parallel.tensor import lstm_forward_tp, shard_lstm_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    T, B, P_in, L = 9, 8, 5, 16  # h = 8, divisible by the 2-way model axis
    params = {
        "W_in": jnp.asarray(rng.uniform(-1, 1, (2, P_in, 4, 8)), jnp.float32),
        "W_rec": jnp.asarray(rng.uniform(-1, 1, (2, 8, 4, 8)), jnp.float32),
        "b": jnp.asarray(rng.uniform(-1, 1, (2, 4, 8)), jnp.float32),
        "peep": jnp.asarray(rng.uniform(-1, 1, (2, 3, 8)), jnp.float32),
    }
    x = jnp.asarray(rng.uniform(-1, 1, (T, B, P_in)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([9, 4, 7, 6, 9, 3, 8, 5], T, B))

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    p_sh = shard_lstm_params(mesh, params)
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))

    dy = jnp.asarray(rng.uniform(-2, 2, (T, B, L)), jnp.float32)

    def loss_tp(p, xx):
        return jnp.sum(lstm_forward_tp(p, xx, pt, 1.0, True, mesh,
                                       batch_axis="data") * dy)

    def loss_1d(p):
        return jnp.sum(lstm_forward(p, x, pt, 1.0, True,
                                    backend="scan") * dy)

    (l_tp, g_tp) = jax.value_and_grad(jax.jit(loss_tp))(p_sh, x_sh)
    (l_1d, g_1d) = jax.value_and_grad(loss_1d)(params)
    assert float(l_tp) == pytest.approx(float(l_1d), rel=1e-5)
    for k in g_1d:
        np.testing.assert_allclose(np.asarray(g_tp[k]), np.asarray(g_1d[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_tensor_parallel_reduces_per_device_memory(rng):
    """The point of TP (cells too wide for one chip): per-device backward
    temp AND parameter argument memory must scale down with the model
    axis (XLA memory_analysis of the compiled grads)."""
    from lstm_rnn_tpu.models.lstm import init_lstm_params, lstm_forward
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths
    from lstm_rnn_tpu.parallel.tensor import (lstm_forward_tp,
                                              shard_lstm_params)

    t, b, p_in, size = 128, 4, 16, 64
    params = init_lstm_params(jax.random.PRNGKey(0), p_in, size, True)
    x = jnp.zeros((t, b, p_in), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([t] * b, t, b))

    def ref_loss(p):
        y = lstm_forward(p, x, pt, 1.0, True, backend="scan")
        return jnp.sum(y * y)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                ("data", "model"))
    ps = shard_lstm_params(mesh, params)

    def tp_loss(p):
        y = lstm_forward_tp(p, x, pt, 1.0, True, mesh, batch_axis="data")
        return jnp.sum(y * y)

    ma0 = jax.jit(jax.grad(ref_loss)).lower(params).compile() \
        .memory_analysis()
    ma1 = jax.jit(jax.grad(tp_loss)).lower(ps).compile().memory_analysis()
    # measured ~3.5x temp / 4x args at these shapes; assert conservative
    assert ma1.temp_size_in_bytes * 2 < ma0.temp_size_in_bytes, (
        ma1.temp_size_in_bytes, ma0.temp_size_in_bytes)
    assert ma1.argument_size_in_bytes * 2 < ma0.argument_size_in_bytes, (
        ma1.argument_size_in_bytes, ma0.argument_size_in_bytes)
