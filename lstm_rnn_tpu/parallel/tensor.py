"""Tensor-parallel LSTM over a jax device mesh (capability beyond the
reference — CURRENNT is strictly single-GPU, SURVEY.md §2.7).

For cells too wide for one chip (or to cut per-chip recurrence latency),
the LSTM's CELL axis is sharded Megatron-style across a "model" mesh axis:
each device owns H/n cells per direction — their input-projection and
recurrent weight COLUMNS, biases, peepholes and cell states — and computes
their gates from the FULL previous output, which is re-assembled once per
timestep with an `all_gather` over ICI inside the scan. jax autodiff turns
that gather into a `reduce_scatter` in the backward pass, so BPTT is
tensor-parallel with the same communication volume.

This composes with the batch-axis data parallelism in `parallel/mesh.py`
(2-D mesh: shard B on "data", H on "model"). The semantics are exactly
`models/lstm.lstm_forward` (CURRENNT cell math, masking, the ±1 delta-clip
and og-peephole quirks come from the same cell code) — proven equal on a
virtual mesh in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lstm_rnn_tpu.models.feedforward import _precision
from lstm_rnn_tpu.models.lstm import lstm_cell_step
from lstm_rnn_tpu.ops.activations import grad_clip


def shard_lstm_params(mesh: Mesh, params, axis: str = "model"):
    """Place one LSTM layer's pytree with the cell axis sharded.

    W_in [D, P, 4, H] / W_rec [D, H, 4, H] shard their LAST axis (the owned
    cells' columns); W_rec's first H axis (the full-h input rows) stays
    replicated. b [D, 4, H] and peep [D, 3, H] shard the last axis too.
    """
    sh = {
        "W_in": P(None, None, None, axis),
        "W_rec": P(None, None, None, axis),
        "b": P(None, None, axis),
        "peep": P(None, None, axis),
    }
    return {k: jax.device_put(v, NamedSharding(mesh, sh[k]))
            for k, v in params.items()}


def lstm_forward_tp(params, x, pattypes, bias_mult: float,
                    bidirectional: bool, mesh: Mesh, axis: str = "model",
                    clip_gradients: bool = True, batch_axis=None):
    """Tensor-parallel equivalent of `lstm_forward` (lax.scan cell).

    x: [T, B, P]; params as in models/lstm.py with H divisible by the mesh
    axis size. Returns [T, B, L] ([fw | bw] per frame). On a 2-D mesh, pass
    `batch_axis` to compose with data parallelism: B shards over that axis
    while the cells shard over `axis` (the per-step all_gather then runs
    only within each model group).
    """
    d = params["W_in"].shape[0]
    h = params["W_in"].shape[-1]
    n = mesh.shape[axis]
    if h % n != 0:
        raise ValueError(f"hidden size {h} must divide the '{axis}' axis ({n})")
    assert d == (2 if bidirectional else 1)
    gclip = grad_clip if clip_gradients else (lambda v: v)

    t, bsz, _ = x.shape
    valid = (pattypes != 0).astype(x.dtype)[:, None, :, None]  # [T, 1, B, 1]
    if bidirectional:
        mask = jnp.concatenate([valid, valid[::-1]], axis=1)
    else:
        mask = valid

    def local(w_in, w_rec, b, peep, x, mask):
        """Per-device: my h/n cells' scan; h re-assembled per step."""
        h_loc = w_in.shape[-1]
        b_loc = x.shape[1]  # local batch (sharded when batch_axis is set)
        # acts for MY cells, all timesteps at once (natural order for d=0,
        # reversed for d=1 — same convention as the scan path)
        acts = jnp.einsum("tbp,dpgh->tdbgh", x, w_in,
                          preferred_element_type=jnp.float32,
                          precision=_precision(x.dtype))
        acts = acts + bias_mult * b[None, :, None]
        if bidirectional:
            acts = jnp.concatenate([acts[:, 0:1], acts[::-1, 1:2]], axis=1)

        def step(carry, inp):
            h_l, c_l = carry  # [D, B, h/n]
            a, m = inp
            # the ONE collective per step: everyone needs the full previous
            # output to feed the recurrent columns it owns
            h_full = jax.lax.all_gather(h_l, axis, axis=2, tiled=True)
            a = a + jnp.einsum("dbh,dhgj->dbgj",
                               h_full.astype(w_rec.dtype), w_rec,
                               preferred_element_type=jnp.float32,
                               precision=_precision(w_rec.dtype))
            # the pinned CURRENNT cell math lives in ONE place
            h_new, c_new = lstm_cell_step(a, c_l, peep, gclip)
            return (h_new * m, c_new * m), h_new * m

        # mark the zero-init carry as device-varying over every axis the
        # body's outputs vary over (shard_map's replication typing)
        vary = (axis,) if batch_axis is None else (axis, batch_axis)
        zero = jax.lax.pcast(jnp.zeros((d, b_loc, h_loc), x.dtype),
                             vary, to="varying")
        init = (zero, zero)
        _, ys = jax.lax.scan(step, init, (acts, mask))
        return ys  # [T, D, B, h/n]

    from jax import shard_map
    ys = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, None, None, axis),
                  P(None, None, axis), P(None, None, axis),
                  P(None, batch_axis, None), P(None, None, batch_axis, None)),
        out_specs=P(None, None, batch_axis, axis),
    )(params["W_in"], params["W_rec"], params["b"], params["peep"], x, mask)

    if bidirectional:
        fw = ys[:, 0]
        bw = ys[::-1, 1]
        return jnp.concatenate([fw, bw], axis=-1)
    return ys[:, 0]
