"""LSTM / bidirectional LSTM with forget gates and peepholes (TPU-native).

Semantics reproduced from `currennt_lib/src/layers/LstmLayer.cu`:

- Cell (ComputeBlockOutputFn, LstmLayer.cu:47-138), per timestep t:
    ni = tanh2(x.Wni + h.Rni + bias*bni)
    ig = sigma(x.Wig + h.Rig + bias*big + c_prev * p_ig)
    fg = sigma(x.Wfg + h.Rfg + bias*bfg + c_prev * p_fg)
    c  = ni*ig + fg*c_prev
    og = sigma(x.Wog + h.Rog + bias*bog + c * p_og)     # peephole from NEW cell state
    h  = tanh2(c) * og
  Padding (PATTYPE_NONE) slots force h = c = 0.

- The input projections for ALL timesteps are computed up front as big GEMMs
  (LstmLayer.cu:772-786); only the recurrent h.R term is inside the scan
  (LstmLayer.cu:812-829). We mirror that: one [T*B, P] x [P, 4H] MXU matmul
  outside `lax.scan`, a [B, H] x [H, 4H] matmul per step inside.

- Backward pass: the reference BPTT (ComputeBlockErrorsFn,
  LstmLayer.cu:190-287) clips each gate delta (the gradient w.r.t. the gate
  PREACTIVATION) to [-1, 1] via limitedError. We wrap each complete
  preactivation in `grad_clip` (identity fwd / clamp bwd), after which jax
  autodiff through the scan computes exactly the same deltas, weight
  gradients (ComputeWeightUpdateFn, LstmLayer.cu:289-512) and
  preceding-layer errors (LstmLayer.cu:990-1009).

- Bidirectional: the layer of size L is split into two independent halves of
  H = L/2 cells; the forward half scans t=0..T-1, the backward half
  t=T-1..0, and outputs are re-interleaved as [fw | bw] per frame
  (ResortOutputsFn, LstmLayer.cu:140-161). Because padding is a suffix of
  every sequence and the reference zeroes h/c at NONE slots, a *global* time
  reversal plus the same masking is exactly equivalent to its backward
  iteration. We stack both directions into ONE `lax.scan` with a leading
  direction axis so the per-step recurrent matmul is a single batched GEMM
  of shape [2, B, H] x [2, H, 4H].

Parameter pytree (H = size for lstm, size/2 per direction for blstm,
D = 1 or 2 directions, P = input size; gate order [ni, ig, fg, og]):
    {"W_in": [D, P, 4, H], "W_rec": [D, H, 4, H],
     "b": [D, 4, H], "peep": [D, 3, H]}           # peep order [ig, fg, og]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lstm_rnn_tpu.models.feedforward import _precision
from lstm_rnn_tpu.ops.activations import grad_clip, logistic, tanh2


def lstm_cell_step(a, c, peep, gclip):
    """CURRENNT cell math from complete gate preactivations a [D, B, 4, H]
    and cell state c [D, B, H] (ComputeBlockOutputFn, LstmLayer.cu:47-138),
    including the split og-peephole path that makes autodiff reproduce the
    clipped/unclipped delta quirk (see the step comments below). Shared by
    the lax.scan path and the tensor-parallel cell (parallel/tensor.py) so
    the carefully-pinned numerics live in exactly one place. Returns
    (h_new, c_new), unmasked."""
    ni = tanh2(gclip(a[:, :, 0]))
    ig = logistic(gclip(a[:, :, 1] + c * peep[:, None, 0]))
    fg = logistic(gclip(a[:, :, 2] + c * peep[:, None, 1]))
    c_new = ni * ig + fg * c
    # Output-gate preactivation: the reference clips the og delta before
    # it reaches the weight/recurrent/peephole-WEIGHT gradients, but uses
    # the UNCLIPPED og delta for the same-timestep cell-state error term
    # `cellStateErr += ogPeepWeight * ogDelta` (LstmLayer.cu:246-250 vs
    # the clipped store at :284). Split the peephole path so autodiff
    # reproduces both: the gclip'd branch carries the gradient to a_og
    # and p_og (clipped), the residual branch carries it to c_new
    # (unclipped).
    p_og = peep[:, None, 2]
    c_sg = jax.lax.stop_gradient(c_new)
    og_pre = gclip(a[:, :, 3] + c_sg * p_og)         + (c_new - c_sg) * jax.lax.stop_gradient(p_og)
    og = logistic(og_pre)
    h_new = tanh2(c_new) * og
    return h_new, c_new


def _lstm_scan(acts, w_rec, peep, mask, clip_gradients: bool,
               remat_blocks: int = 0, init=None, return_carry: bool = False):
    """Scan both (or one) directions at once.

    acts: [T, D, B, 4, H] input projections + bias (already added)
    w_rec: [D, H, 4, H]; peep: [D, 3, H]; mask: [T, D, B, 1] (1.0 valid / 0.0 pad)
    Returns outputs [T, D, B, H].

    init: optional explicit (h, c) starting state ([D, B, H] each) and
    return_carry=True additionally returns the final (h, c) — the
    streaming-inference hooks (Network.apply_streaming carries state
    across chunks; only meaningful for the forward direction).

    remat_blocks > 0: gradient checkpointing over K time blocks
    (jax.checkpoint around an inner block scan) — the backward pass holds
    only ONE block's cell intermediates (~8 [Tb, D, B, H] tensors) plus K
    block-boundary carries instead of the whole sequence's, trading ~2x
    cell recompute for activation memory that scales as T/K. The
    single-chip long-sequence lever (the multi-chip one is
    parallel/sequence.py); identical gradients, tested.
    """
    gclip = grad_clip if clip_gradients else (lambda x: x)

    def step(carry, inp):
        h, c = carry  # [D, B, H] each
        a, m = inp  # a: [D, B, 4, H], m: [D, B, 1]
        a = a + jnp.einsum("dbh,dhgj->dbgj", h.astype(w_rec.dtype), w_rec,
                           preferred_element_type=h.dtype,
                           precision=_precision(w_rec.dtype))
        h_new, c_new = lstm_cell_step(a, c, peep, gclip)
        return (h_new * m, c_new * m), h_new * m

    t, d, b, h = acts.shape[0], acts.shape[1], acts.shape[2], acts.shape[4]
    if init is None:
        init = (
            jnp.zeros((d, b, h), dtype=acts.dtype),
            jnp.zeros((d, b, h), dtype=acts.dtype),
        )
    k = min(remat_blocks, t) if remat_blocks else 0
    if k <= 1:
        carry, ys = jax.lax.scan(step, init, (acts, mask))
        return (ys, carry) if return_carry else ys
    if return_carry:
        # the remat path's trailing zero-mask pad steps would zero a
        # returned carry; streaming never remats. A hard error (not an
        # assert, which python -O strips) — silently unpacking the plain
        # ys return as (ys, carry) would propagate garbage state
        raise ValueError("return_carry is not supported with remat_blocks")

    # pad T to K equal blocks with zero-mask steps: they sit after every
    # real frame of this (possibly direction-reversed) stream, where the
    # reference zeroes h/c anyway, and their outputs are sliced off
    tb = -(-t // k)
    tp = tb * k
    acts = _pad_axis(acts, 0, tp)
    mask = _pad_axis(mask, 0, tp)

    # prevent_cse=False: inside lax.scan the CSE barriers are unnecessary
    # (per the jax.checkpoint docs) and would inhibit fusion
    @functools.partial(jax.checkpoint, prevent_cse=False)
    def block(carry, inp):
        return jax.lax.scan(step, carry, inp)

    blk = lambda a: a.reshape(k, tb, *a.shape[1:])
    _, ys = jax.lax.scan(block, init, (blk(acts), blk(mask)))
    return ys.reshape(tp, d, b, h)[:t]


def _pad_axis(a, axis, target):
    pad = target - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def lstm_forward(params, x, pattypes, bias_mult: float, bidirectional: bool,
                 clip_gradients: bool = True, backend: str = "auto",
                 compute_dtype=jnp.float32, pre_padded: bool = False,
                 need_dx: bool = True, remat_blocks: int = 0):
    """x: [T, B, P], pattypes: [T, B] int8 -> outputs [T, B, L].

    L = H for unidirectional, 2H for bidirectional ([fw | bw] per frame).
    backend: "scan" (lax.scan), "pallas" (fused Mosaic kernel),
    "pallas_interpret" (kernel in interpreter mode, for CPU tests), or
    "auto" (pallas on TPU, scan elsewhere).
    compute_dtype: matmul input dtype — bfloat16 uses the MXU's native
    precision for the projections and the recurrent matmuls (activations,
    accumulation and state stay float32); float32 is the parity mode.
    pre_padded: params come from Network.pad_params (H already a 128
    multiple, x width already matches W_in's rows); skip per-call padding
    AND keep the output padded ([fw_pad | bw_pad]) for the next layer.
    need_dx=False (first hidden layer) lets the fused backward kernel skip
    the preceding-layer error; the scan path ignores it (XLA dead-code
    eliminates the unused einsum cotangent there).
    remat_blocks=K (scan backend only): checkpoint the recurrence in K
    time blocks so backward activation memory scales as T/K (see
    _lstm_scan); the fused Pallas kernels keep their own residual regime.

    Validity precondition (pallas backends): each row's valid frames must
    be a PREFIX (trailing padding only) — the kernels reduce pattypes to
    per-row lengths. Every fraction the DataSet assembles satisfies this
    by construction (one sequence per row, trailing NONE); arbitrary
    mid-row gaps are a STREAMING concern, where apply_streaming feeds the
    kernel a per-step mask instead (_streaming_fused). The scan backend
    masks per step and accepts any pattern.
    """
    w_in, w_rec, b, peep = params["W_in"], params["W_rec"], params["b"], params["peep"]
    t, bsz, _ = x.shape
    d = w_in.shape[0]
    hdim = w_in.shape[-1]
    assert d == (2 if bidirectional else 1)

    if pre_padded:
        # padded view: W_in [D, Pp, 4Hp] (gates flattened, rows padded to a
        # 128 multiple), b [D, 4Hp]; the kernel computes the projection
        from lstm_rnn_tpu.ops.lstm_cell import (DEFAULT_CHUNK, batch_granule,
                                                lstm_scan_fused, round_up)
        hp = w_rec.shape[1]  # already padded
        pp = w_in.shape[1]
        bp = round_up(bsz, batch_granule(compute_dtype))
        tp = round_up(t, DEFAULT_CHUNK)
        xx = x.astype(compute_dtype)
        xx = _pad_axis(_pad_axis(_pad_axis(xx, 2, pp), 1, bp), 0, tp)
        lengths = jnp.sum((pattypes != 0).astype(jnp.int32), axis=0)
        lengths = _pad_axis(lengths, 0, bp)
        interp = backend == "pallas_interpret" or (
            backend in ("auto", "pallas") and jax.default_backend() != "tpu")
        ys = lstm_scan_fused(xx, w_in, w_rec.reshape(d, hp, 4 * hp),
                             peep, b, lengths, float(bias_mult),
                             clip_gradients, interp, jnp.dtype(compute_dtype),
                             need_dx)
        # kernel emits [T, B, D*Hp] = [fw_pad|bw_pad] per frame directly
        return ys[:t, :bsz]

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
        if remat_blocks:
            # checkpointing exists to shrink the scan path's residuals;
            # the fused kernel has its own residual regime, so the flag
            # forces the scan backend rather than silently doing nothing
            backend = "scan"
        if backend == "pallas":
            # VMEM guard: fall back to lax.scan when the fused kernels'
            # resident set would not fit
            from lstm_rnn_tpu.ops.lstm_cell import (_storage, fused_fits,
                                                    round_up)
            hp = round_up(hdim, 128)
            sz = _storage(compute_dtype).itemsize
            bp = round_up(bsz, 16 if sz == 2 else 8)
            pp = round_up(x.shape[-1], 128)
            if not fused_fits(hp, pp, bp, compute_dtype):
                backend = "scan"
            else:
                # honor a recorded DEVICE verdict that no chunk fits this
                # point — the analytic model underestimates Mosaic's
                # scoped-vmem stack, and re-entering the kernel here would
                # die at device compile with an opaque overflow
                from lstm_rnn_tpu.ops.lstm_cell import DEFAULT_CHUNK
                from lstm_rnn_tpu.ops.vmem_probe import known_unfit
                tp = round_up(x.shape[0], DEFAULT_CHUNK)
                if known_unfit(tp, hp, pp, bp, compute_dtype):
                    backend = "scan"

    if backend in ("pallas", "pallas_interpret"):
        if remat_blocks:
            raise ValueError(
                "remat_blocks only applies to the scan backend (the fused "
                "Pallas kernels keep their own residual regime); use "
                "lstm_backend=scan or auto")
        from lstm_rnn_tpu.ops.lstm_cell import (DEFAULT_CHUNK, _storage,
                                                fused_fits, lstm_scan_fused,
                                                round_up)

        hp = round_up(hdim, 128)
        pp = round_up(x.shape[-1], 128)
        if backend == "pallas" and jax.default_backend() == "tpu":
            # explicit-pallas VMEM guard: a cell too wide even at chunk=1
            # would otherwise die at device compile with an opaque Mosaic
            # scoped-vmem overflow (the "auto" path falls back silently);
            # a recorded DEVICE verdict that no chunk fits is the same
            # condition established empirically (matching _resolve_fused)
            from lstm_rnn_tpu.ops.vmem_probe import known_unfit
            sz0 = _storage(compute_dtype).itemsize
            bp0 = round_up(bsz, 16 if sz0 == 2 else 8)
            tp0 = round_up(x.shape[0], DEFAULT_CHUNK)
            unfit_model = not fused_fits(hp, pp, bp0, compute_dtype)
            if unfit_model or known_unfit(tp0, hp, pp, bp0, compute_dtype):
                verdict = ("exceeds the fused kernels' VMEM budget at every "
                           "chunk size" if unfit_model else
                           "has a recorded device probe verdict that no "
                           "chunk fits")
                raise ValueError(
                    f"lstm_backend=pallas: layer (H={hdim}, P={x.shape[-1]}, "
                    f"B={bsz}, {jnp.dtype(compute_dtype).name}) {verdict}; "
                    "use lstm_backend=auto (falls back to lax.scan) or "
                    "shard the cell with --model_devices")
        # the kernel consumes NATURAL time order for both directions
        # (backward-direction ordering is pure block indexing), computes the
        # input projection per chunk and adds the bias itself; trailing
        # time/batch padding is masked via lengths
        (hp, pp, _bp, _tp, w_in_p, w_rec_p, b_p, peep_p, xx,
         lengths) = _pad_fused_operands(w_in, w_rec, b, peep, x, pattypes,
                                        compute_dtype)

        ys = lstm_scan_fused(xx, w_in_p.reshape(d, pp, 4 * hp),
                             w_rec_p.reshape(d, hp, 4 * hp), peep_p,
                             b_p.reshape(d, 4 * hp), lengths,
                             float(bias_mult), clip_gradients,
                             backend == "pallas_interpret",
                             jnp.dtype(compute_dtype), need_dx)
        ys = ys[:t, :bsz].astype(x.dtype)  # [T, B, D*hp]; strip padding
        if bidirectional:
            return jnp.concatenate([ys[..., :hdim], ys[..., hp:hp + hdim]],
                                   axis=-1)
        return ys[..., :hdim]

    # lax.scan path
    acts, valid = _scan_acts_valid(x, pattypes, w_in, b, bias_mult,
                                   compute_dtype)
    if bidirectional:
        acts = jnp.concatenate([acts[:, 0:1], acts[::-1, 1:2]], axis=1)
        mask = jnp.concatenate([valid, valid[::-1]], axis=1)
    else:
        mask = valid

    ys = _lstm_scan(acts, w_rec.astype(compute_dtype), peep, mask,
                    clip_gradients, remat_blocks)  # [T, D, B, H]

    if bidirectional:
        fw = ys[:, 0]
        bw = ys[::-1, 1]
        return jnp.concatenate([fw, bw], axis=-1)  # [T, B, 2H]
    return ys[:, 0]


def _scan_acts_valid(x, pattypes, w_in, b, bias_mult, compute_dtype):
    """Input projection + validity mask shared by the whole-sequence scan
    path and the streaming path — the parity-pinned numerics (f32
    accumulation, precision pin, bias multiplier) live in exactly one
    place so the 'chained chunks == whole-sequence apply' contract cannot
    silently fork."""
    acts = jnp.einsum("tbp,dpgh->tdbgh", x.astype(compute_dtype),
                      w_in.astype(compute_dtype),
                      preferred_element_type=jnp.float32,
                      precision=_precision(compute_dtype))
    acts = acts + bias_mult * b[None, :, None]  # TrainableLayer bias()
    valid = (pattypes != 0).astype(x.dtype)[:, None, :, None]  # [T, 1, B, 1]
    return acts, valid


def lstm_forward_streaming(params, x, pattypes, bias_mult: float, carry,
                           clip_gradients: bool = True,
                           compute_dtype=jnp.float32, backend: str = "scan"):
    """One chunk of a UNIDIRECTIONAL layer from an explicit (h, c) state.

    x: [T, B, P] chunk; carry: ((h, c), [1, B, H] each) from the previous
    chunk (or Network.init_stream_state). Returns (y [T, B, H],
    new_carry). Chaining chunks is exactly lstm_forward(backend="scan")
    on their concatenation — the streaming-serving primitive
    (Network.apply_streaming). Bidirectional layers cannot stream (the
    backward half consumes the future); callers validate.

    backend: "scan" (default — exact parity numerics), "pallas"/
    "pallas_interpret"/"auto" route the chunk through the carry-capable
    fused kernel (ops/lstm_cell.lstm_scan_fused_carry) with the same
    on-the-fly padding as lstm_forward's pallas path — the chunk rate then
    matches the whole-sequence inference kernel instead of lax.scan.
    """
    w_in, w_rec, b, peep = (params["W_in"], params["W_rec"], params["b"],
                            params["peep"])
    if backend != "scan":
        hdim = w_in.shape[-1]
        use_fused, interp = _resolve_fused(backend, hdim, x.shape[-1],
                                           x.shape[1], compute_dtype,
                                           t=x.shape[0])
        if use_fused and not interp:
            # a recorded mask-probe rejection (the masked forward's block
            # LAYOUT or footprint failed on this device at the serving
            # chunk — ops/vmem_probe.py mask family) routes auto to scan;
            # explicit pallas raises like _resolve_fused's own guards
            from lstm_rnn_tpu.ops.lstm_cell import (fused_padded_dims,
                                                    pick_chunk)
            from lstm_rnn_tpu.ops.vmem_probe import mask_known_unfit
            hp, pp, bp, tp = fused_padded_dims(
                hdim, x.shape[-1], x.shape[1], x.shape[0], compute_dtype)
            ch = pick_chunk(tp, hp, pp, bp, compute_dtype, with_mask=True)
            # _streaming_fused dispatches carry_t = the RAW chunk length
            # (x.shape[0]); when that differs from the 16-padded tp the
            # probed variant must match (vmem_probe _mask_key carry_t)
            if mask_known_unfit(tp, hp, pp, bp, ch, compute_dtype,
                                carry_t=x.shape[0]):
                if backend == "pallas":
                    raise ValueError(
                        f"lstm_backend=pallas: the masked streaming "
                        f"forward (H={hdim}, P={x.shape[-1]}, "
                        f"B={x.shape[1]}, chunk={ch}) was REJECTED by the "
                        "device probe (ops/vmem_probe.py mask family); "
                        "use lstm_backend=auto (falls back to lax.scan)")
                use_fused = False
        if use_fused:
            return _streaming_fused(params, x, pattypes, bias_mult, carry,
                                    clip_gradients, compute_dtype, interp)
    acts, mask = _scan_acts_valid(x, pattypes, w_in, b, bias_mult,
                                  compute_dtype)
    ys, new_carry = _lstm_scan(acts, w_rec.astype(compute_dtype), peep,
                               mask, clip_gradients, init=carry,
                               return_carry=True)
    return ys[:, 0], new_carry


def _pad_fused_operands(w_in, w_rec, b, peep, x, pattypes, compute_dtype,
                        time_pad: bool = True):
    """The fused kernels' zero-pad prologue, shared by lstm_forward's
    pallas path, _streaming_fused, and sequence parallelism's
    _fused_wavefront so the padding contract genuinely lives in ONE place
    (the three sites drifted as copies once already).

    Pads cells to a 128 lane multiple, input features to 128, batch rows
    to the storage dtype's sublane granule, and (time_pad) the time axis
    to a DEFAULT_CHUNK multiple. Zero padding is numerically exact: padded
    cells output exactly 0 and receive exactly 0 gradient. Weights keep
    their [D, ...] axes (callers reshape/slice per direction); x is cast
    to the compute dtype; lengths are the prefix-validity reduction of
    pattypes, batch-padded with zeros.

    Returns (hp, pp, bp, tp, w_in_p, w_rec_p, b_p, peep_p, xx, lengths).
    """
    from lstm_rnn_tpu.ops.lstm_cell import fused_padded_dims
    t, bsz, pdim = x.shape
    hdim = w_in.shape[-1]
    hp, pp, bp, tp = fused_padded_dims(hdim, pdim, bsz, t, compute_dtype,
                                       time_pad=time_pad)
    w_in_p = _pad_axis(_pad_axis(w_in, 3, hp), 1, pp)
    w_rec_p = _pad_axis(_pad_axis(w_rec, 3, hp), 1, hp)
    b_p = _pad_axis(b, 2, hp)
    peep_p = _pad_axis(peep, 2, hp)
    xx = x.astype(compute_dtype)
    xx = _pad_axis(_pad_axis(_pad_axis(xx, 2, pp), 1, bp), 0, tp)
    lengths = jnp.sum((pattypes != 0).astype(jnp.int32), axis=0)
    lengths = _pad_axis(lengths, 0, bp)
    return hp, pp, bp, tp, w_in_p, w_rec_p, b_p, peep_p, xx, lengths


def _resolve_fused(backend: str, hdim: int, pdim: int, bsz: int,
                   compute_dtype, carry_grad: bool = False, t: int = 0):
    """(use_fused, interpret) for a carry-kernel candidate — the same
    auto/VMEM/device-verdict gates as lstm_forward's pallas dispatch:
    'auto' falls back to lax.scan on an analytic OR device-recorded unfit,
    explicit 'pallas' on a real TPU raises instead (matching
    lstm_forward's explicit-pallas guard — silently downgrading an
    explicit kernel request to a ~3x slower scan, or letting the device
    compile die with an opaque Mosaic overflow, both hide the problem).

    carry_grad: the caller DIFFERENTIATES the carry kernel (sequence
    parallelism) — gate on the larger carry-gradient footprint and its
    own probe family; streaming serving (primal only) keeps the plain
    bound.

    t: the caller's (unpadded) time length — device verdicts are keyed by
    chunk-grid size, so the unfit lookup needs the real T."""
    from lstm_rnn_tpu.ops.lstm_cell import fused_fits, fused_padded_dims
    from lstm_rnn_tpu.ops.vmem_probe import known_unfit
    hp, pp, bp, tp = fused_padded_dims(hdim, pdim, bsz, max(1, t),
                                       compute_dtype)
    on_tpu = jax.default_backend() == "tpu"
    if backend == "auto" and not on_tpu:
        return False, False  # mirror lstm_forward: auto -> scan off-TPU
    interp = backend == "pallas_interpret" or (
        backend == "pallas" and not on_tpu)
    if interp:
        # interpret mode has no VMEM constraint: run the kernel exactly as
        # requested (mirroring lstm_forward, which runs interpret kernels
        # off-TPU regardless of the analytic model). Falling back to scan
        # here would make a CPU parity test of a wide layer silently
        # compare scan against scan — proving nothing.
        return True, True
    analytic_fit = fused_fits(hp, pp, bp, compute_dtype, carry=carry_grad)
    device_unfit = on_tpu and known_unfit(tp, hp, pp, bp, compute_dtype,
                                          carry=carry_grad)
    if backend == "pallas" and on_tpu and (not analytic_fit or device_unfit):
        verdict = ("a recorded device probe verdict says no chunk fits"
                   if device_unfit else "the VMEM model fits no chunk")
        raise ValueError(
            f"lstm_backend=pallas: layer (H={hdim}, P={pdim}, B={bsz}, "
            f"{jnp.dtype(compute_dtype).name}) — {verdict}; use "
            "lstm_backend=auto (falls back to lax.scan) or shard the cell "
            "with --model_devices")
    if not analytic_fit or (backend == "auto" and device_unfit):
        return False, interp
    return True, interp


def _streaming_fused(params, x, pattypes, bias_mult, carry, clip_gradients,
                     compute_dtype, interpret):
    """The streaming chunk on the carry-capable fused kernel: pad widths/
    batch/time exactly like lstm_forward's pallas path (zero padding is
    numerically inert — padded cells emit 0 and stay 0 through the carry),
    run lstm_scan_fused_carry, slice the exact state back out so chunks
    can interleave with the scan path freely."""
    from lstm_rnn_tpu.ops.lstm_cell import lstm_scan_fused_carry
    w_in, w_rec, b, peep = (params["W_in"], params["W_rec"], params["b"],
                            params["peep"])
    t, bsz, pdim = x.shape
    hdim = w_in.shape[-1]
    (hp, pp, bp, tp, w_in_p, w_rec_p, b_p, peep_p, xx,
     lengths) = _pad_fused_operands(w_in, w_rec, b, peep, x, pattypes,
                                    compute_dtype)
    # streaming chunks carry PER-STEP validity, not a prefix: a sequence
    # may end and another begin inside one chunk ([LAST, NONE, FIRST, ...]
    # rows), and the scan backend zeroes state exactly at each NONE step —
    # a prefix-lengths reduction would feed the gap frame into the cell
    # and leak sequence A's state into sequence B. Hand the kernel the
    # real [B, T] step mask (zero-padded: alignment padding is invalid).
    step_mask = (pattypes != 0).astype(jnp.float32).T
    step_mask = _pad_axis(_pad_axis(step_mask, 1, tp), 0, bp)
    h_st, c_st = carry  # [1, B, H] each
    h0 = _pad_axis(_pad_axis(h_st.astype(jnp.float32), 2, hp), 1, bp)
    c0 = _pad_axis(_pad_axis(c_st.astype(jnp.float32), 2, hp), 1, bp)
    ys, (hf, cf) = lstm_scan_fused_carry(
        xx, w_in_p.reshape(1, pp, 4 * hp), w_rec_p.reshape(1, hp, 4 * hp),
        peep_p, b_p.reshape(1, 4 * hp), lengths, h0, c0,
        float(bias_mult), clip_gradients, interpret,
        jnp.dtype(compute_dtype), True, t, 0, step_mask)
    y = ys[:t, :bsz, :hdim].astype(x.dtype)
    new_carry = (hf[:, :bsz, :hdim].astype(h_st.dtype),
                 cf[:, :bsz, :hdim].astype(c_st.dtype))
    return y, new_carry


def init_lstm_params(rng, in_size: int, size: int, bidirectional: bool,
                     dist: str = "uniform", lo: float = -0.1, hi: float = 0.1,
                     mean: float = 0.0, sigma: float = 0.1, dtype=jnp.float32):
    """Random init matching the reference's distributions (TrainableLayer.cu:103-125).

    Note the reference draws ALL weights of a layer from one flat stream in
    CURRENNT's storage order; we do not replicate the stream order (tests pin
    initial weights explicitly), only the distribution.
    """
    d = 2 if bidirectional else 1
    h = size // d
    shapes = {
        "W_in": (d, in_size, 4, h),
        "W_rec": (d, h, 4, h),
        "b": (d, 4, h),
        "peep": (d, 3, h),
    }
    params = {}
    for k, shp in shapes.items():
        rng, sub = jax.random.split(rng)
        if dist == "uniform":
            params[k] = jax.random.uniform(sub, shp, dtype=dtype, minval=lo, maxval=hi)
        else:
            params[k] = mean + sigma * jax.random.normal(sub, shp, dtype=dtype)
    return params
