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
