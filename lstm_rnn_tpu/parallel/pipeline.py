"""Pipeline parallelism over the layer stack (capability beyond the
reference — CURRENNT is strictly single-GPU, SURVEY.md §2.7).

The hidden-layer stack (specs[1:-1], output softmax included) is split into
contiguous STAGES, one per device along a "pipe" mesh axis. A fraction's
batch axis is cut into microbatches and the stages run a GPipe-style
software pipeline: at clock tick k, stage s processes microbatch k - s and
`ppermute`s its full-sequence activations to stage s + 1 over ICI. The
loss/accuracy accumulate on the last stage and `psum` back to every device;
jax autodiff through the tick scan + ppermute yields the exact backward
pipeline (cotangents flow stage P-1 -> 0 in reverse clock order).

Design choices, TPU-first:
- Parameters stay REPLICATED; stages differ only by `lax.axis_index` and a
  `lax.switch` over per-stage layer branches. This sidesteps heterogeneous
  per-stage weight shapes (the LSTM stack's first layer has a different
  input width) and means gradient psum over the pipe axis reproduces the
  single-device gradient EXACTLY (each device contributes only its stage's
  layers; the rest are zeros).
- Stage messages are full-sequence [T, bm, maxW] float32 buffers padded to
  the widest stage boundary, so every tick's ppermute is one uniform ICI
  transfer.
- The microbatch sum over the batch axis equals the unpipelined loss (the
  losses sum over patterns), so training with --pipeline_devices N matches
  single-device training up to float reduction order — proven on the
  virtual mesh in tests/test_pipeline.py.
- Composes with the padded fused-kernel training view (padded=True) and
  with data parallelism (a 2-D ("data", "pipe") mesh shards B over "data"
  and pipelines within each shard).

Useful when a deep stack's ACTIVATION/residual memory outgrows one chip
(each stage holds only its layers' activations — weights stay replicated,
so parameter memory does not shrink) or to stack deep recurrent towers:
recurrence serializes T, but the pipeline keeps P chips busy on separate
microbatches concurrently. Raise `microbatches` above the stage count to
amortize the GPipe bubble (utilization = m / (m + P - 1)).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def stage_ranges(n_layers: int, n_stages: int) -> Sequence[tuple]:
    """Contiguous balanced [lo, hi) ranges over the hidden layers."""
    if n_stages > n_layers:
        raise ValueError(
            f"pipeline_devices={n_stages} exceeds the {n_layers} hidden "
            "layers — nothing to place on the extra stages")
    bounds = np.linspace(0, n_layers, n_stages + 1).round().astype(int)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_stages)]


def loss_and_count_pipelined(net, params, x, targets, pattypes, mesh: Mesh,
                             axis: str = "pipe", padded: bool = False,
                             microbatches: int = 0):
    """(total error, correct count) of the full net, pipeline-parallel.

    x: [T, B, F]; targets [T, B] int or [T, B, W]; pattypes [T, B] int8.
    Differentiable: jax.grad of the returned error reproduces the
    single-device gradients (psum'd over the pipe axis).

    padded=True runs the padded training view (params from
    Network.pad_params; the fused TPU kernels consume activations without
    per-step pad/slice copies). microbatches (0 = stage count) trades the
    GPipe bubble against per-microbatch kernel efficiency: utilization is
    m / (m + P - 1).
    """
    return _pipelined(net, params, x, targets, pattypes, mesh, axis,
                      padded, microbatches, want_outputs=False)


def apply_pipelined(net, params, x, pattypes, mesh: Mesh,
                    axis: str = "pipe", padded: bool = False,
                    microbatches: int = 0):
    """Pipeline-parallel forward pass: [T, B, output_size] activations —
    the inference/serving twin of loss_and_count_pipelined (CLI forward
    mode with --pipeline_devices). The last stage scatters each
    microbatch's exact outputs into its slot; other stages contribute
    zeros and the psum over the pipe axis reassembles the batch."""
    return _pipelined(net, params, x, None, pattypes, mesh, axis,
                      padded, microbatches, want_outputs=True)


def _pipelined(net, params, x, targets, pattypes, mesh, axis, padded,
               microbatches, want_outputs):
    n_stages = int(mesh.shape[axis])
    # optional data-parallel composition: a 2-D ("data", "pipe") mesh
    # shards B over "data" and pipelines within each data shard
    data_ax = "data" if "data" in mesh.axis_names else None
    nd = int(mesh.shape[data_ax]) if data_ax else 1
    hidden = net.specs[1:-1]
    ranges = stage_ranges(len(hidden), n_stages)
    t, b, f_in = x.shape

    # microbatches split each data shard's block; ragged batches pad with
    # PATTYPE_NONE columns, which every loss/counter masks out
    # (numerically inert; the want_outputs return path slices them off
    # internally — apply_pipelined returns exactly [T, B, out])
    m = microbatches if microbatches and microbatches > 0 else n_stages
    gran = m * nd
    bp = -(-b // gran) * gran
    bm = bp // gran
    db = bp - b
    if db:
        x = jnp.pad(x, ((0, 0), (0, db), (0, 0)))
        pattypes = jnp.pad(pattypes, ((0, 0), (0, db)))
        if targets is not None:
            if targets.ndim == 2:
                targets = jnp.pad(targets, ((0, 0), (0, db)),
                                  constant_values=-1)
            else:
                targets = jnp.pad(targets, ((0, 0), (0, db), (0, 0)))

    if padded:
        # padded-view activation widths: an LSTM emits [fw_pad | bw_pad]
        # (d * hp); feedforward/softmax stay exact (Network._pad_plan)
        from lstm_rnn_tpu import io_currennt as ioc
        in_w = [f_in]
        for s_, (kind, _pi, _pw, hp) in zip(hidden, net._pad_plan()):
            if kind == "lstm":
                d_ = 2 if ioc.LSTM_TYPES[s_.type] else 1
                in_w.append(d_ * hp)
            else:
                in_w.append(s_.size)
    else:
        in_w = [f_in] + [s.size for s in hidden]
    out_w = hidden[-1].size
    max_w = max(in_w[lo] for lo, _ in ranges[1:]) if n_stages > 1 else out_w
    max_w = max(max_w, out_w)

    def make_branch(idx, lo, hi):
        def branch(prm, buf, xm, pt):
            inp = xm if idx == 0 else buf[..., :in_w[lo]]
            if padded:
                y = net.apply_padded_layer_range(prm, inp, pt, lo, hi)
                if idx == n_stages - 1:
                    # the loss/outputs consume EXACT output activations
                    y = net.slice_padded_output(y)
            else:
                y = net.apply_layer_range(prm, inp, pt, lo, hi)
            from lstm_rnn_tpu.models.lstm import _pad_axis
            # stage messages are f32 regardless of the compute dtype (the
            # scan carry has one dtype; each stage casts to its compute
            # dtype on entry anyway)
            return _pad_axis(y, y.ndim - 1, max_w).astype(jnp.float32)

        return branch

    branches = [make_branch(i, lo, hi) for i, (lo, hi) in enumerate(ranges)]
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def local(prm, x_loc, t_loc, p_loc):
        # [M, T, bm, ...] microbatch-major views of this data shard's
        # block (consecutive batch columns)
        def mb_view(a):
            return a.reshape(a.shape[0], m, bm, *a.shape[2:]).swapaxes(0, 1)

        x_mb, p_mb = mb_view(x_loc), mb_view(p_loc)
        t_mb = None if want_outputs else mb_view(t_loc)
        stage = jax.lax.axis_index(axis)
        is_last = stage == n_stages - 1

        def tick(carry, k):
            buf, acc = carry
            mi = jnp.clip(k - stage, 0, m - 1)
            active = (k >= stage) & (k - stage < m)
            xm = jax.lax.dynamic_index_in_dim(x_mb, mi, 0, keepdims=False)
            pt = jax.lax.dynamic_index_in_dim(p_mb, mi, 0, keepdims=False)
            act = jax.lax.switch(stage, branches, prm, buf, xm, pt)
            use = active & is_last
            if want_outputs:
                ybuf = acc
                cur = jax.lax.dynamic_index_in_dim(ybuf, mi, 0,
                                                   keepdims=False)
                val = jnp.where(use, act[..., :out_w], cur)
                acc = jax.lax.dynamic_update_index_in_dim(ybuf, val, mi, 0)
            else:
                err, corr = acc
                tg = jax.lax.dynamic_index_in_dim(t_mb, mi, 0,
                                                  keepdims=False)
                # sanitize BEFORE the loss: on non-final stages `act`
                # holds intermediate activations whose log/ratio terms
                # could emit NaN even under a zero mask (0 * nan = nan in
                # the cotangent)
                y = jnp.where(use, act[..., :out_w],
                              jnp.ones((), act.dtype))
                acc = (err + net.loss_fn(y, tg, pt) * use,
                       corr + net.correct_count(y, tg, pt)
                       * use.astype(jnp.int32))
            if perm:
                buf = jax.lax.ppermute(act, axis, perm)
            else:
                buf = act
            return (buf, acc), None

        zero = jnp.zeros((t, bm, max_w), jnp.float32)
        if want_outputs:
            acc0 = jnp.zeros((m, t, bm, out_w), jnp.float32)
        else:
            acc0 = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32))
        # GPipe-standard per-microbatch rematerialization: without the
        # checkpoint the tick scan stores every tick's stage residuals
        # (~(m + P - 1) microbatch-sized residual sets per device, MORE
        # than unpipelined); with it only the [T, bm, max_w] stage
        # messages persist and the backward recomputes one tick at a
        # time — measured ~5x below even the UNPIPELINED per-device
        # memory in tests/test_pipeline.py, gradients identical.
        # prevent_cse=False: inside lax.scan the CSE barriers are
        # unnecessary (per the jax.checkpoint docs)
        (_, acc), _ = jax.lax.scan(
            jax.checkpoint(tick, prevent_cse=False), (zero, acc0),
            jnp.arange(m + n_stages - 1))
        if want_outputs:
            # [M, T, bm, out] -> this shard's [T, M*bm, out]; non-last
            # stages scattered nothing (zeros), so the pipe psum is the
            # last stage's outputs broadcast to every device
            y = acc.swapaxes(0, 1).reshape(t, m * bm, out_w)
            return jax.lax.psum(y, axis)
        axes = (axis,) if data_ax is None else (axis, data_ax)
        return jax.lax.psum(acc[0], axes), jax.lax.psum(acc[1], axes)

    from jax import shard_map
    # check_vma=False: the stage branches run the SHARED layer code, whose
    # internal lax.scan carries are not annotated for this mesh axis; the
    # outputs are explicitly psum'd so replication is guaranteed by
    # construction (equality vs the single-device net is tested)
    bspec = P(None, data_ax)
    if want_outputs:
        y = shard_map(local, mesh=mesh,
                      in_specs=(P(), bspec, P(), bspec),
                      out_specs=P(None, data_ax, None),
                      check_vma=False)(params, x, jnp.zeros(()), pattypes)
        return y[:, :b]  # drop the microbatch-granule pad columns
    return shard_map(local, mesh=mesh,
                     in_specs=(P(), bspec, bspec, bspec),
                     out_specs=(P(), P()),
                     check_vma=False)(params, x, targets, pattypes)
