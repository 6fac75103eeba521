"""Sequence parallelism over the TIME axis (capability beyond the
reference — CURRENNT is strictly single-GPU, SURVEY.md §2.7).

Every [T, B, ...] array is sharded over a "seq" mesh axis: device i holds
time block i. Everything FRAME-LOCAL then runs fully parallel with zero
communication — the LSTM input projections (the FLOP-dominant GEMMs), the
feedforward/softmax layers, and every post-output loss/counter (all are
masked per-frame sums, so one psum over the axis reassembles them). Only
the LSTM recurrence is inherently sequential, and it runs as a WAVEFRONT:
S rounds, in round r the device holding block r scans its local timesteps
and `ppermute`s the (h, c) carry to block r+1 over ICI. A bidirectional
layer runs the two directions as opposite-direction wavefronts
concurrently (the forward carry travels 0 -> S-1 while the backward carry
travels S-1 -> 0), so two devices are active every round. jax autodiff
through the round scan + ppermute yields the exact BPTT: carry cotangents
flow backwards along the same links in reverse round order.

What this buys, TPU-first:
- LONG SEQUENCES THAT DON'T FIT ONE CHIP: per-device memory for
  activations, recurrence residuals, and loss tensors scales as T/S —
  the axis to reach sequence lengths where `--truncate_seq` (the
  reference's only recourse) would destroy context.
- The projection/softmax/loss FLOPs genuinely parallelize; the
  recurrence's wall-clock stays T steps per layer (its data dependence is
  irreducible without changing the cell math), but each step's tensors
  are block-local and the carry hop is a [B, H]-sized ICI transfer.

Design choices (mirroring parallel/pipeline.py):
- Parameters stay REPLICATED — gradient psum over "seq" reproduces the
  single-device gradient exactly (each frame's contribution is computed
  on exactly one device).
- The cell math is the shared `lstm_cell_step` (models/lstm.py), so the
  CURRENNT numerics — tanh2 cells, ±1 gate-delta clipping with the
  unclipped-og quirk (LstmLayer.cu:246-284) — live in one place; the
  local block scan is frame-for-frame identical to the single-device
  `lax.scan` path, proven in tests/test_sequence.py.
- Composes with data parallelism: a 2-D ("data", "seq") mesh shards B
  over "data" and T over "seq" within each data shard.
- Pairs with the lax.scan cell (the fused Pallas kernel assumes it owns
  the whole sequence; carries in/out of a block are scan territory) —
  the same pairing tensor parallelism uses.
- Layers run their wavefronts SEQUENTIALLY rather than as a diagonal
  (layer, block) pipeline. For unidirectional stacks a diagonal would
  overlap layers (L*S/(S+L-1) speedup), but CURRENNT's stacks are
  BLSTM: layer l's block-0 output is complete only once its backward
  direction has swept all the way down (round S-1), so layer l+1's
  forward wavefront cannot start earlier anyway — the diagonal
  degenerates to ~L*S rounds for bidirectional stacks, which is what
  the sequential schedule already costs. Pipeline parallelism
  (--pipeline_devices) is the axis that overlaps layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lstm_rnn_tpu.models.feedforward import (_precision, feedforward_forward,
                                             softmax_forward)
from lstm_rnn_tpu.models.lstm import lstm_cell_step
from lstm_rnn_tpu.ops.activations import grad_clip


def _scan_block(acts, w_rec, peep, mask, gclip, h0, c0):
    """Scan ONE direction's local time block from an explicit carry.

    acts: [Tl, B, 4, H] complete preactivations (projection + bias);
    w_rec: [H, 4, H]; peep: [3, H]; mask: [Tl, B, 1]; h0/c0: [B, H].
    Frame-for-frame the same math as models/lstm._lstm_scan (shared
    lstm_cell_step; identical einsum reduction order), so a chain of
    blocks linked by carries equals the single-device scan exactly.
    """

    def step(carry, inp):
        h, c = carry
        a, m = inp
        a = a + jnp.einsum("bh,hgj->bgj", h.astype(w_rec.dtype), w_rec,
                           preferred_element_type=h.dtype,
                           precision=_precision(w_rec.dtype))
        h2, c2 = lstm_cell_step(a[None], c[None], peep[None], gclip)
        h2 = h2[0] * m
        c2 = c2[0] * m
        return (h2, c2), h2

    (h_t, c_t), ys = jax.lax.scan(step, (h0, c0), (acts, mask))
    return ys, h_t, c_t


def _wavefront(dirs, gclip, axis: str, n: int):
    """The recurrence over the time-sharded sequence, all directions in
    ONE round scan.

    Runs inside shard_map. dirs: list of (acts [Tl, B, 4, H], w_rec
    [H, 4, H], peep [3, H], mask [Tl, B, 1], reverse) — one entry per
    direction. Round r activates the device scanning global block r for
    a forward direction and block S-1-r for a reverse one; the (h, c)
    carries ppermute one hop per round. Every direction's cond runs
    BEFORE any ppermute, so in a bidirectional layer the two active
    devices (opposite ends of the wavefront) compute their blocks
    concurrently — the collectives only join them at the end of the
    round. Inactive devices take the cheap cond branch and wait at the
    ppermutes; total compute equals the single-device scan. Returns one
    [Tl, B, H] output block per direction (reverse directions restored
    to natural order).
    """
    idx = jax.lax.axis_index(axis)
    chans = []
    for acts, w_rec, peep, mask, reverse in dirs:
        if reverse:
            # global time order T-1..0 = blocks S-1..0, each scanned
            # reversed. Suffix padding is handled exactly like the
            # single-device path: the mask zeroes h/c at NONE slots,
            # which is equivalent to the reference's backward iteration
            # visiting them first.
            acts, mask = acts[::-1], mask[::-1]
            active_round = n - 1 - idx
            shift = -1
        else:
            active_round = idx
            shift = 1
        perm = [(i, i + shift) for i in range(n) if 0 <= i + shift < n]
        chans.append((acts, w_rec, peep, mask, active_round, perm))

    b, h = dirs[0][0].shape[1], dirs[0][0].shape[3]
    dt = dirs[0][0].dtype

    def tick(state, r):
        # all direction scans first (concurrent across their active
        # devices), collectives after
        ran = []
        for (acts, w_rec, peep, mask, active, _perm), st in zip(chans,
                                                                state):
            def run(op, acts=acts, w_rec=w_rec, peep=peep, mask=mask):
                h0, c0, _ys = op
                ys, h_t, c_t = _scan_block(acts, w_rec, peep, mask,
                                           gclip, h0, c0)
                return h_t, c_t, ys

            ran.append(jax.lax.cond(jnp.equal(active, r), run,
                                    lambda op: op, st))
        new = []
        for (_a, _w, _p, _m, _act, perm), (h_c, c_c, ys) in zip(chans,
                                                                ran):
            if perm:
                h_c = jax.lax.ppermute(h_c, axis, perm)
                c_c = jax.lax.ppermute(c_c, axis, perm)
            new.append((h_c, c_c, ys))
        return tuple(new), None

    state0 = tuple(
        (jnp.zeros((b, h), dt), jnp.zeros((b, h), dt),
         jnp.zeros(acts.shape[:2] + (h,), dt))
        for (acts, _w, _p, _m, _act, _perm) in chans)
    # checkpoint each round: without it the round scan stores a FULL
    # block's cell residuals for every one of the n rounds (the cond
    # allocates the run branch's residuals even in skip rounds), making
    # per-device backward memory ~T instead of ~T/S. With it the scan
    # saves only the carried state per round — (h, c) plus each
    # direction's [Tl, B, H] ys block, one layer-output copy in total —
    # and the backward recomputes each device's single active block.
    # Measured ~S-fold residual reduction (clean T/S scaling at S=2/4/8)
    # in tests/test_sequence.py's memory_analysis check, gradients
    # identical. prevent_cse=False: inside lax.scan the CSE barriers are
    # unnecessary (per the jax.checkpoint docs) and would inhibit fusion
    # in the hot loop.
    state, _ = jax.lax.scan(jax.checkpoint(tick, prevent_cse=False),
                            state0, jnp.arange(n))
    return [st[2][::-1] if d[4] else st[2]
            for st, d in zip(state, dirs)]


def lstm_forward_seq(params, x, pattypes, bias_mult: float,
                     bidirectional: bool, axis: str, n: int,
                     clip_gradients: bool = True,
                     compute_dtype=jnp.float32):
    """Time-sharded LSTM layer; call INSIDE shard_map over `axis`.

    x: this device's [Tl, B, P] block; pattypes: [Tl, B]. Returns the
    local [Tl, B, L] output block (L = H or 2H, [fw | bw] per frame as in
    ResortOutputsFn, LstmLayer.cu:140-161). The input projection + bias
    runs block-local (the parallel win); only the recurrence wavefronts.
    """
    w_in, w_rec, b, peep = (params["W_in"], params["W_rec"], params["b"],
                            params["peep"])
    gclip = grad_clip if clip_gradients else (lambda v: v)

    acts = jnp.einsum("tbp,dpgh->tdbgh", x.astype(compute_dtype),
                      w_in.astype(compute_dtype),
                      preferred_element_type=jnp.float32,
                      precision=_precision(compute_dtype))
    acts = acts + bias_mult * b[None, :, None]
    mask = (pattypes != 0).astype(x.dtype)[:, :, None]  # [Tl, B, 1]
    w_rec = w_rec.astype(compute_dtype)

    dirs = [(acts[:, 0], w_rec[0], peep[0], mask, False)]
    if bidirectional:
        dirs.append((acts[:, 1], w_rec[1], peep[1], mask, True))
    ys = _wavefront(dirs, gclip, axis, n)
    return ys[0] if not bidirectional else jnp.concatenate(ys, axis=-1)


def _pad_time(x, targets, pattypes, n: int):
    """Pad T to a multiple of the seq-axis size with PATTYPE_NONE rows —
    numerically inert (losses/counters mask them; the LSTM zeroes h/c)."""
    t = x.shape[0]
    tp = -(-t // n) * n
    dt = tp - t
    if not dt:
        return x, targets, pattypes, t
    x = jnp.pad(x, ((0, dt), (0, 0), (0, 0)))
    pattypes = jnp.pad(pattypes, ((0, dt), (0, 0)))
    if targets is not None:
        if targets.ndim == 2:
            targets = jnp.pad(targets, ((0, dt), (0, 0)), constant_values=-1)
        else:
            targets = jnp.pad(targets, ((0, dt), (0, 0), (0, 0)))
    return x, targets, pattypes, t


def loss_and_count_seq(net, params, x, targets, pattypes, mesh: Mesh,
                       axis: str = "seq"):
    """(total error, correct count) of the full net, sequence-parallel.

    x: [T, B, F]; targets [T, B] int or [T, B, W]; pattypes [T, B] int8.
    Differentiable: jax.grad reproduces the single-device gradients
    (psum'd over the seq axis). Composes with a "data" axis (B sharded)
    when the mesh has one.
    """
    return _seq_run(net, params, x, targets, pattypes, mesh, axis,
                    want_outputs=False)


def apply_seq(net, params, x, pattypes, mesh: Mesh, axis: str = "seq"):
    """Sequence-parallel forward pass: [T, B, output_size] activations —
    the serving twin of loss_and_count_seq (CLI forward mode with
    --seq_devices). The output is naturally time-sharded; shard_map's
    out_specs reassemble it."""
    return _seq_run(net, params, x, None, pattypes, mesh, axis,
                    want_outputs=True)


def _seq_run(net, params, x, targets, pattypes, mesh, axis, want_outputs):
    from lstm_rnn_tpu import io_currennt as ioc

    n = int(mesh.shape[axis])
    data_ax = "data" if "data" in mesh.axis_names else None
    x, targets, pattypes, t = _pad_time(x, targets, pattypes, n)

    def local(prm, x_loc, tg_loc, pt_loc):
        h = x_loc
        for s in net.specs[1:-1]:
            p = prm[s.name]
            if s.type in ioc.LSTM_TYPES:
                h = lstm_forward_seq(p, h, pt_loc, s.bias,
                                     ioc.LSTM_TYPES[s.type], axis, n,
                                     clip_gradients=net.clip_gradients,
                                     compute_dtype=net.compute_dtype)
            elif s.type == "softmax":
                h = softmax_forward(p, h, s.bias, net.compute_dtype)
            else:
                h = feedforward_forward(p, h,
                                        ioc.FEEDFORWARD_TYPES[s.type],
                                        s.bias, net.compute_dtype)
        if want_outputs:
            return h
        axes = (axis,) if data_ax is None else (axis, data_ax)
        err = net.loss_fn(h, tg_loc, pt_loc)
        corr = net.correct_count(h, tg_loc, pt_loc)
        return jax.lax.psum(err, axes), jax.lax.psum(corr, axes)

    from jax import shard_map
    xspec = P(axis, data_ax, None)
    tspec = P(axis, data_ax)
    # check_vma=False: the layer bodies are the SHARED single-device code,
    # whose internal scan carries are not annotated for this mesh axis; the
    # scalar outputs are explicitly psum'd and the outputs path's sharding
    # is declared by out_specs (equality vs the single-device net is
    # tested)
    if want_outputs:
        return shard_map(local, mesh=mesh,
                         in_specs=(P(), xspec, P(), tspec),
                         out_specs=xspec,
                         check_vma=False)(params, x, jnp.zeros(()),
                                          pattypes)[:t]
    tgspec = tspec if targets.ndim == 2 else xspec
    return shard_map(local, mesh=mesh,
                     in_specs=(P(), xspec, tgspec, tspec),
                     out_specs=(P(), P()),
                     check_vma=False)(params, x, targets, pattypes)
