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
- On TPU each device's block scan runs the CARRY-capable fused kernel
  (lstm_scan_fused_carry; _fused_wavefront) — explicit (h, c) in/out per
  block, the BLSTM backward half as a dir_offset=1 descending kernel —
  falling back to the shared lax.scan cell off-TPU or when the kernel's
  VMEM gates reject the shape (_resolve_fused). Tensor parallelism, by
  contrast, stays on the scan cell: its per-STEP all_gather is
  incompatible with a whole-block kernel.
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
from lstm_rnn_tpu.models.lstm import _pad_axis, lstm_cell_step
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


def _fused_wavefront(params, x, pattypes, bias_mult, bidirectional, axis,
                     n, clip_gradients, compute_dtype, interpret):
    """The wavefront on the carry-capable fused kernel: each device's block
    scan runs lstm_scan_fused_carry (D=1; dir_offset=1 for the BLSTM
    backward half — descending scan over natural-order arrays), chained by
    the same ppermute carry hops as the lax.scan wavefront. The input
    projection moves IN-KERNEL (each device is active exactly once per
    direction, so total projection FLOPs are unchanged); weights are padded
    once per layer call, outside the round scan."""
    from lstm_rnn_tpu.models.lstm import _pad_fused_operands
    from lstm_rnn_tpu.ops.lstm_cell import lstm_scan_fused_carry
    w_in, w_rec, b, peep = (params["W_in"], params["W_rec"], params["b"],
                            params["peep"])
    tl, bsz, pdim = x.shape
    hdim = w_in.shape[-1]
    D = 2 if bidirectional else 1
    if tl % 16:
        raise ValueError(
            f"fused sequence parallelism needs the local time block ({tl}) "
            "to be a multiple of 16 (chunk-alignment padding would zero "
            "mid-stream carries) — _pad_time(granule=16) guarantees this")

    # the shared zero-pad prologue (models/lstm.py); time_pad=False — the
    # block length is already chunk-aligned (validated above), and trailing
    # time padding would zero mid-stream carries
    (hp, pp, bp, _tp, w_in_p, w_rec_p, b_p, peep_p, xx,
     lengths) = _pad_fused_operands(w_in, w_rec, b, peep, x, pattypes,
                                    compute_dtype, time_pad=False)

    idx = jax.lax.axis_index(axis)
    chans = []
    for d in range(D):
        if d == 0:
            active_round, shift = idx, 1
        else:
            active_round, shift = n - 1 - idx, -1
        perm = [(i, i + shift) for i in range(n) if 0 <= i + shift < n]
        chans.append((d, active_round, perm))

    dt = jnp.float32

    def tick(state, r):
        ran = []
        for (d, active, _perm), st in zip(chans, state):
            def run(op, d=d):
                h0, c0, _ys = op
                h0p = _pad_axis(_pad_axis(h0[None], 2, hp), 1, bp)
                c0p = _pad_axis(_pad_axis(c0[None], 2, hp), 1, bp)
                y, (hf, cf) = lstm_scan_fused_carry(
                    xx, w_in_p[d:d + 1].reshape(1, pp, 4 * hp),
                    w_rec_p[d:d + 1].reshape(1, hp, 4 * hp),
                    peep_p[d:d + 1], b_p[d:d + 1].reshape(1, 4 * hp),
                    lengths, h0p, c0p, float(bias_mult), clip_gradients,
                    interpret, jnp.dtype(compute_dtype), True, None, d)
                return (hf[0, :bsz, :hdim].astype(dt),
                        cf[0, :bsz, :hdim].astype(dt),
                        y[:tl, :bsz, :hdim].astype(dt))

            ran.append(jax.lax.cond(jnp.equal(active, r), run,
                                    lambda op: op, st))
        new = []
        for (_d, _act, perm), (h_c, c_c, ys) in zip(chans, ran):
            if perm:
                h_c = jax.lax.ppermute(h_c, axis, perm)
                c_c = jax.lax.ppermute(c_c, axis, perm)
            new.append((h_c, c_c, ys))
        return tuple(new), None

    state0 = tuple(
        (jnp.zeros((bsz, hdim), dt), jnp.zeros((bsz, hdim), dt),
         jnp.zeros((tl, bsz, hdim), dt))
        for _ in chans)
    # same per-round checkpoint as the scan wavefront (see _wavefront)
    state, _ = jax.lax.scan(jax.checkpoint(tick, prevent_cse=False),
                            state0, jnp.arange(n))
    ys = [st[2] for st in state]
    return ys[0] if not bidirectional else jnp.concatenate(ys, axis=-1)


def lstm_forward_seq(params, x, pattypes, bias_mult: float,
                     bidirectional: bool, axis: str, n: int,
                     clip_gradients: bool = True,
                     compute_dtype=jnp.float32, backend: str = "scan"):
    """Time-sharded LSTM layer; call INSIDE shard_map over `axis`.

    x: this device's [Tl, B, P] block; pattypes: [Tl, B]. Returns the
    local [Tl, B, L] output block (L = H or 2H, [fw | bw] per frame as in
    ResortOutputsFn, LstmLayer.cu:140-161). The input projection + bias
    runs block-local (the parallel win); only the recurrence wavefronts.

    backend: "scan" (default) or pallas/pallas_interpret/auto — the fused
    carry kernel then runs each device's block scan (~3x the scan cell
    rate on device), chained by the same ppermute carries.
    """
    w_in, w_rec, b, peep = (params["W_in"], params["W_rec"], params["b"],
                            params["peep"])
    if backend != "scan":
        from lstm_rnn_tpu.models.lstm import _resolve_fused
        # carry_grad: SP training differentiates the carry kernel, whose
        # backward footprint exceeds the plain kernels' — gate (and probe)
        # on the carry family, not the carry-less verdicts
        use_fused, interp = _resolve_fused(backend, w_in.shape[-1],
                                           x.shape[-1], x.shape[1],
                                           compute_dtype, carry_grad=True,
                                           t=x.shape[0])
        if use_fused and x.shape[0] % 16 == 0:
            return _fused_wavefront(params, x, pattypes, bias_mult,
                                    bidirectional, axis, n, clip_gradients,
                                    compute_dtype, interp)
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


def _pad_time(x, targets, pattypes, n: int, granule: int = 1):
    """Pad T to a multiple of n*granule with PATTYPE_NONE rows —
    numerically inert (losses/counters mask them; the LSTM zeroes h/c).
    granule=16 when the fused kernel may run the block scans: every local
    block is then a whole number of kernel chunks, so no device ever adds
    LOCAL time padding (which would zero mid-stream carries)."""
    t = x.shape[0]
    tp = -(-t // (n * granule)) * n * granule
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
    # chunk-granule padding only when block scans can take the fused path
    # (auto resolves to scan off-TPU — don't inflate T for nothing)
    granule = 16 if (net.backend in ("pallas", "pallas_interpret")
                     or (net.backend == "auto"
                         and jax.default_backend() == "tpu")) else 1
    x, targets, pattypes, t = _pad_time(x, targets, pattypes, n, granule)

    def local(prm, x_loc, tg_loc, pt_loc):
        h = x_loc
        for s in net.specs[1:-1]:
            p = prm[s.name]
            if s.type in ioc.LSTM_TYPES:
                h = lstm_forward_seq(p, h, pt_loc, s.bias,
                                     ioc.LSTM_TYPES[s.type], axis, n,
                                     clip_gradients=net.clip_gradients,
                                     compute_dtype=net.compute_dtype,
                                     backend=net.backend)
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
