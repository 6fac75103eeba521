"""Fused Pallas LSTM scan kernel (TPU fast path).

The sequential recurrence is the only part of the LSTM that cannot be one
big MXU matmul. `jax.lax.scan` compiles fine but leaves per-step
fusion/scheduling to XLA; this kernel instead runs the WHOLE scan as one
Mosaic program per direction:

- grid (D, T/CH): one program per (direction, time chunk); the Mosaic
  pipeline streams each chunk's operands (HBM -> VMEM, double-buffered)
  while the previous chunk computes; CH timesteps run unrolled per step;
- the INPUT PROJECTION runs inside the kernel: each program computes its
  chunk's gate preactivations as ONE [CH*B, P] x [P, 4H] MXU matmul from
  the layer input x (the reference's time-batched GEMMs,
  LstmLayer.cu:772-786, fused with the recurrence). The [D, T, B, 4H]
  activation tensor never exists in HBM — on the flagship that tensor was
  the single largest HBM stream of the whole step (written + read once per
  direction, forward and backward);
- the BLSTM backward direction is handled purely through BLOCK INDEXING:
  its index maps walk the chunks in reverse ((1-d)*k + d*(NC-1-k)) and its
  inner loop walks each chunk's rows in reverse — NO time-reversed copies of
  activations are materialized (profiling showed per-direction
  slicing/concatenation costing multiple ms/step);
- h/c live in VMEM scratch across the sequence; the recurrent and input
  weights stay VMEM-resident; the cell math (CURRENNT-exact: tanh2 =
  2*sigma(2x)-1, peepholes incl. the og peephole from the NEW cell state)
  fuses with the MXU matmuls;
- variable-length masking is computed in-kernel from per-sequence lengths.
  Padding is a suffix (DataSet.cpp fraction assembly), so validity is
  `t < length` for both directions in natural time order;
- the forward pass stores the post-activation gates plus each chunk's
  scan-final cell state (c_bound); backward is a second Pallas kernel
  running the reference BPTT (ComputeBlockErrorsFn, LstmLayer.cu:190-287)
  over the saved gates — no gate recompute — with the +-1 delta clipping
  and the unclipped-og-delta cell-state-error quirk reproduced exactly.
  c_bound supplies the cross-chunk c_prev so the full c array is read only
  once in the backward pass. Weight gradients then become big MXU einsums
  over the kernel's delta output (dW_in = x^T dA etc.), mirroring
  ComputeWeightUpdateFn's reductions;
- in bfloat16 mode the STREAMED tensors (x, h, gates, dA, dh) are stored in
  bf16 — halving the dominant HBM traffic — while the cell state c, the
  in-kernel recurrence state and all matmul accumulation stay float32.

Shapes: x [T, B, P] in NATURAL time order, w_in [D, P, 4H], w_rec
[D, H, 4H], peep [D, 3, H], bias [D, 4H], lengths [B] int32. Returns h
[T, B, D*H] ([fw|bw] per frame — already the next layer's input layout, so
no direction re-interleave ever materializes) in natural time order. Requires H % 128 == 0,
P % 128 == 0, B % 8 == 0 (float32) or B % 16 == 0 (bfloat16) and
T % chunk == 0 — callers pad (zero-padding cells, batch rows, input
features and trailing timesteps is numerically exact: padded slots produce
exactly 0 and receive exactly 0 gradient).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lstm_rnn_tpu.ops.activations import logistic, tanh2

DEFAULT_CHUNK = 16

# Process-wide float32 matmul mode (set via --f32_matmul 3x / bench flags):
# False = 6-pass bf16 emulation (Precision.HIGHEST — bit-faithful f32, the
# parity default); True = manual 3-pass hi/lo bf16 decomposition inside the
# kernels (~2x the MXU throughput, ~5e-7 relative matmul error vs f32's
# ~1e-7 — Mosaic supports only DEFAULT (1-pass bf16, 2e-3 error: too
# lossy) and HIGHEST, so the 3-pass split is built by hand). Read at trace
# time; irrelevant in bfloat16 mode.
F32_MATMUL_3X = False


def _use3(compute_dtype) -> bool:
    return (F32_MATMUL_3X
            and jnp.dtype(compute_dtype) == jnp.dtype(jnp.float32))


def _kdot(a, b, dims, precision, use3: bool):
    """dot_general with optional 3-pass bf16 decomposition for f32 operands:
    a = hi(a) + lo(a) in bf16, product ~= hi.hi + hi.lo + lo.hi (the lo.lo
    term is below f32 round-off). DEFAULT precision on the bf16 passes."""
    if not use3:
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _chunk_of(d, k, NC: int, reverse_scan: bool):
    """Chunk index for direction d at grid step k (both traced). d=0 scans
    natural time ascending, d=1 descending; BPTT kernels flip both.
    Callers pass d + dir_offset: a D=1 kernel with dir_offset=1 runs its
    single direction as the DESCENDING scan over natural-order arrays —
    sequence parallelism's per-device block scan for the BLSTM backward
    half (reversed copies would break the suffix-padding mask)."""
    fwd = (1 - d) * k + d * (NC - 1 - k)
    if reverse_scan:
        return (1 - d) * (NC - 1 - k) + d * k
    return fwd


def _dir_index(NC: int, reverse_scan: bool, off: int = 0):
    return lambda d, k: (d, _chunk_of(d + off, k, NC, reverse_scan), 0, 0)


def _x_index(NC: int, reverse_scan: bool, off: int = 0):
    """x [T, B, P] has no direction axis; both directions read each chunk."""
    return lambda d, k: (_chunk_of(d + off, k, NC, reverse_scan), 0, 0)


def _nb_index(NC: int, off: int = 0):
    """BPTT: chunk holding direction d's forward-scan-previous neighbor —
    chunk-1 for d=0 (its scan ascends), chunk+1 for d=1 (clamped)."""
    def f(d, k):
        dd = d + off
        cur = _chunk_of(dd, k, NC, True)
        return (d, jnp.clip(cur - 1 + 2 * dd, 0, NC - 1), 0, 0)
    return f


def _valid(lengths_ref, t):
    """[B, 1] float validity at natural time t (padding is a suffix)."""
    return (lengths_ref[:, 0:1] > t).astype(jnp.float32)


def _cell_acts(fast: bool):
    """(sigma, tanh) used inside the kernels.

    Parity mode (f32 storage): the CURRENNT-exact forms — logistic with the
    reference's hard +-expLimit saturation branches and tanh as
    2*sigma(2x)-1 (Tanh.cuh). bf16 fast mode: the saturation selects only
    change values beyond |x|=88.7 (a denormal ~1e-38 vs an exact 0 — far
    below bf16 resolution) and native tanh == 2*sigma(2x)-1 to f32
    round-off, so both collapse to the plain VPU transcendentals; the cell
    runs ~10 fewer vector ops per step, which matters because the forward
    kernel is VPU-bound (RESULTS.md roofline)."""
    if fast:
        return jax.nn.sigmoid, jnp.tanh
    return logistic, tanh2


def _fwd_kernel(lengths_ref, *rest, T, CH, NC, bias_mult, precision, use3,
                fast, save, carry, carry_t, dir_offset, with_mask=False):
    """One direction's chunk per program. Blocks arrive pre-indexed (leading
    dim 1); the inner loop order and the mask time are direction-dependent.
    save=False is the INFERENCE variant (primal path outside jax.grad —
    eval passes, the CLI forward mode): only h is written; the gates/c/
    boundary residual streams (the bulk of the kernel's HBM writes) are
    never materialized. carry=True (streaming / sequence parallelism —
    lstm_scan_fused_carry) starts the scan from explicit (h0, c0) inputs
    and emits the d=0 direction's state AT step carry_t-1 (the last REAL
    timestep — trailing chunk-alignment padding zeroes the masked state,
    so capturing at the padded T-1 would destroy a mid-stream carry) plus
    the d=1 direction's state at its scan end (t=0): identical to chaining
    lax.scan blocks (the masked scan's carry is 0 for rows past their
    length, exactly what the in-kernel masking leaves in the scratch)."""
    d = pl.program_id(0)
    k = pl.program_id(1)
    if with_mask:
        # [1, B, CHP] per-step validity (streaming chunks with mid-chunk
        # sequence boundaries — lengths can only express a valid PREFIX).
        # Each chunk's mask lives in its own lane-padded (CHP >= 128) row of
        # a (NC, B, CHP) array: a (B, CH) block of a (B, T) array would have
        # lane dim CH, which Mosaic rejects unless CH % 128 == 0 or CH == T
        # (device-compile error the interpret tests cannot catch). Column j
        # is natural time chunk*CH + j, like x's block.
        mask_ref, *rest = rest
    else:
        mask_ref = None
    x_ref, w_in_ref, w_rec_ref, peep_ref, bias_ref, *rest = rest
    if carry:
        h0_ref, c0_ref, *rest = rest
    else:
        h0_ref = c0_ref = None
    h_out_ref, *rest = rest
    if save:
        c_out_ref, g_out_ref, cb_out_ref, hb_out_ref, *rest = rest
    else:
        c_out_ref = g_out_ref = cb_out_ref = hb_out_ref = None
    if carry:
        hf_out_ref, cf_out_ref, *rest = rest
    h_scr, c_scr = rest

    @pl.when(k == 0)
    def _():
        if carry:
            h_scr[...] = h0_ref[0].astype(jnp.float32)
            c_scr[...] = c0_ref[0].astype(jnp.float32)
        else:
            h_scr[...] = jnp.zeros_like(h_scr)
            c_scr[...] = jnp.zeros_like(c_scr)

    B, H = h_scr.shape
    chunk = _chunk_of(d + dir_offset, k, NC, False)
    w = w_rec_ref[0]
    sdtype = h_out_ref.dtype
    logistic, tanh2 = _cell_acts(fast)
    p_ig = peep_ref[0, 0:1, :]
    p_fg = peep_ref[0, 1:2, :]
    p_og = peep_ref[0, 2:3, :]

    # the whole chunk's input projections in one MXU matmul; bias folded in
    # ((CH, B, P) -> (CH*B, P) merges tile-aligned leading dims: free)
    P = x_ref.shape[-1]
    a_all = _kdot(x_ref[...].reshape(CH * B, P), w_in_ref[0],
                  (((1,), (0,)), ((), ())), precision, use3)
    a_all = a_all + bias_ref[pl.ds(d, 1), :] * bias_mult

    def run(js, is_fwd_dir):
        if carry:
            # final-state capture point: the d=0 direction's last REAL step
            # (carry_t-1), the d=1 direction's scan end (t=0)
            cap_chunk, j_cap = (((carry_t - 1) // CH, (carry_t - 1) % CH)
                                if is_fwd_dir else (0, 0))
        h = h_scr[...]
        c = c_scr[...]
        for j in js:
            t = chunk * CH + j
            a = a_all[j * B:(j + 1) * B] + _kdot(
                h.astype(w.dtype), w,
                (((1,), (0,)), ((), ())), precision, use3)
            ni = tanh2(a[:, 0 * H:1 * H])
            ig = logistic(a[:, 1 * H:2 * H] + c * p_ig)
            fg = logistic(a[:, 2 * H:3 * H] + c * p_fg)
            c_new = ni * ig + fg * c
            og = logistic(a[:, 3 * H:4 * H] + c_new * p_og)
            h_new = tanh2(c_new) * og

            m = (mask_ref[0, :, j:j + 1] if with_mask
                 else _valid(lengths_ref, t))
            h = h_new * m
            c = c_new * m
            h_out_ref[j] = h.astype(sdtype)
            if save:
                c_out_ref[0, j] = c
                g_out_ref[0, j] = jnp.concatenate(
                    [ni, ig, fg, og], axis=-1).astype(sdtype)
            if carry and j == j_cap:
                hcap, ccap = h, c

                @pl.when(chunk == cap_chunk)
                def _():
                    hf_out_ref[0] = hcap
                    cf_out_ref[0] = ccap
        h_scr[...] = h
        c_scr[...] = c
        # the chunk's scan-final cell state / output (cross-chunk c_prev and
        # h_prev for the backward pass's in-kernel weight-gradient matmuls)
        if save:
            cb_out_ref[0, 0] = c
            hb_out_ref[0, 0] = h.astype(sdtype)

    @pl.when(d + dir_offset == 0)
    def _():
        run(range(CH), True)

    @pl.when(d + dir_offset != 0)
    def _():
        run(range(CH - 1, -1, -1), False)


def _bwd_kernel(lengths_ref, x_ref, dh_ref, g_ref, c_ref, cb_ref,
                h_ref, hb_ref, w_in_ref, w_rec_ref, peep_ref,
                *rest, T, CH, NC, clip, precision, use3, fast, with_dx,
                carry, carry_t, dir_offset):
    """BPTT over saved gates, walking each direction's scan in reverse.

    The cross-chunk c_prev / h_prev come from the forward pass's boundary
    outputs, so c and h are streamed exactly once. The weight gradients
    (ComputeWeightUpdateFn, LstmLayer.cu:289-512) accumulate IN-KERNEL into
    revisited per-direction output blocks — one [P, CH*B] x [CH*B, 4H] MXU
    matmul per chunk for dW_in, one for dW_rec, VPU row-reductions for
    dpeep/dbias. The preceding-layer error (LstmLayer.cu:990-1009) is ALSO
    computed in-kernel per chunk (dx = da . W_in^T) while the deltas sit in
    VMEM scratch — the [D, T, B, 4H] delta tensor never exists in HBM at
    all (it used to be written once and re-read by an outside dx einsum:
    the largest remaining HBM stream of the backward pass). with_dx=False
    (the network's FIRST hidden layer: its input is the data, which needs
    no error signal — LstmLayer.cu:990 is skipped for layer 1 there too)
    drops the dx output and its [CH*B, 4H] x [P, 4H]^T matmul entirely.

    carry=True additionally receives (h0, c0) — the forward's initial state
    — plus the cotangents (dhf, dcf) of the forward's final state, and
    emits (dh0, dc0). The carry chain rules fold into the existing BPTT
    recurrence: the final (h, c) are the step-(carry_t-1) (d=0) / step-0
    (d=1) state through an identity, so dhf joins e and dcf joins cs_err
    at exactly that step; the sequence edge uses (h0, c0) as the
    scan-previous state instead of zeros (c_prev for fg deltas/peepholes,
    h_prev for dW_rec)."""
    d = pl.program_id(0)
    k = pl.program_id(1)
    if carry:
        h0_ref, c0_ref, dhf_ref, dcf_ref, *rest = rest
    else:
        h0_ref = c0_ref = dhf_ref = dcf_ref = None
    if with_dx:
        dx_ref, *rest = rest
    else:
        dx_ref = None
    dwin_ref, dwrec_ref, dpeep_ref, dbias_ref, *rest = rest
    if carry:
        dh0_ref, dc0_ref, *rest = rest
    dac_scr, da_scr, cse_scr, fg_scr = rest

    @pl.when(k == 0)
    def _():
        da_scr[...] = jnp.zeros_like(da_scr)
        cse_scr[...] = jnp.zeros_like(cse_scr)
        fg_scr[...] = jnp.zeros_like(fg_scr)
        dwin_ref[...] = jnp.zeros_like(dwin_ref)
        dwrec_ref[...] = jnp.zeros_like(dwrec_ref)
        dpeep_ref[...] = jnp.zeros_like(dpeep_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    B, H = cse_scr.shape
    chunk = _chunk_of(d + dir_offset, k, NC, True)
    w = w_rec_ref[0]
    sdtype = dac_scr.dtype
    logistic, tanh2 = _cell_acts(fast)
    p_ig = peep_ref[0, 0:1, :]
    p_fg = peep_ref[0, 1:2, :]
    p_og = peep_ref[0, 2:3, :]

    def run(js, ascending_scan):
        if carry:
            # final-state capture point (mirrors the forward kernel)
            cap_chunk, j_cap = (((carry_t - 1) // CH, (carry_t - 1) % CH)
                                if ascending_scan else (0, 0))
        da_next = da_scr[...]
        cse_next = cse_scr[...]
        fg_next = fg_scr[...]
        for j in js:
            t = chunk * CH + j
            m = _valid(lengths_ref, t)
            # scan-previous neighbor: t-1 (ascending scan) or t+1 (descending)
            if ascending_scan:
                at_edge = t <= 0
                c_prev = c_ref[0, j - 1] if j > 0 else None
            else:
                at_edge = t >= T - 1
                c_prev = c_ref[0, j + 1] if j < CH - 1 else None
            if c_prev is None:
                if carry:
                    c_prev = jnp.where(at_edge,
                                       c0_ref[0].astype(jnp.float32),
                                       cb_ref[0, 0])
                else:
                    c_prev = cb_ref[0, 0] * (1.0 - at_edge.astype(
                        jnp.float32))
            # with an explicit carry the sequence edge HAS a previous cell
            # state (c0) — fg deltas are not zeroed there
            has_prev = (1.0 if carry
                        else 1.0 - at_edge.astype(jnp.float32))
            c = c_ref[0, j]
            gg = g_ref[0, j].astype(jnp.float32)
            ni = gg[:, 0 * H:1 * H]
            ig = gg[:, 1 * H:2 * H]
            fg = gg[:, 2 * H:3 * H]
            og = gg[:, 3 * H:4 * H]

            e = dh_ref[j].astype(jnp.float32) + _kdot(
                da_next.astype(w.dtype), w,
                (((1,), (1,)), ((), ())), precision, use3)
            dcf_term = None
            if carry and j == j_cap:
                # the final (h, c) are this step's (h, c) through an
                # identity: their cotangents join e / cs_err right here
                inj = (chunk == cap_chunk).astype(jnp.float32)
                e = e + dhf_ref[0].astype(jnp.float32) * inj
                dcf_term = dcf_ref[0].astype(jnp.float32) * inj

            tanh_c = tanh2(c)
            og_delta = og * (1.0 - og) * tanh_c * e
            # NB: UNCLIPPED og delta here (LstmLayer.cu:246-250); next-step
            # ig/fg deltas are the CLIPPED stored ones, csErr is unclipped.
            cs_err = (og * (1.0 - tanh_c * tanh_c) * e + p_og * og_delta
                      + fg_next * cse_next
                      + p_ig * da_next[:, 1 * H:2 * H]
                      + p_fg * da_next[:, 2 * H:3 * H])
            if dcf_term is not None:
                cs_err = cs_err + dcf_term

            ni_delta = ig * (1.0 - ni * ni) * cs_err
            fg_delta = fg * (1.0 - fg) * c_prev * cs_err * has_prev
            ig_delta = ig * (1.0 - ig) * ni * cs_err

            if clip:
                ni_delta = jnp.clip(ni_delta, -1.0, 1.0)
                ig_delta = jnp.clip(ig_delta, -1.0, 1.0)
                fg_delta = jnp.clip(fg_delta, -1.0, 1.0)
                og_delta_st = jnp.clip(og_delta, -1.0, 1.0)
            else:
                og_delta_st = og_delta

            da = jnp.concatenate(
                [ni_delta, ig_delta, fg_delta, og_delta_st], axis=-1) * m
            da_next = da
            cse_next = cs_err * m
            fg_next = fg * m
            dac_scr[j] = da.astype(sdtype)
        da_scr[...] = da_next
        cse_scr[...] = cse_next
        fg_scr[...] = fg_next

        if carry:
            # after the direction's last BPTT step, the remaining recurrence
            # terms are exactly the initial-state gradients: dh0 = da_0 W^T
            # (the recurrent matmul's input), dc0 = fg_0*cse_0 + the ig/fg
            # peephole terms (the same expression the recurrence applies at
            # every step, evaluated at the virtual step before the scan)
            @pl.when(k == NC - 1)
            def _():
                dh0_ref[0] = _kdot(da_next.astype(w.dtype), w,
                                   (((1,), (1,)), ((), ())), precision, use3)
                dc0_ref[0] = (fg_next * cse_next
                              + p_ig * da_next[:, 1 * H:2 * H]
                              + p_fg * da_next[:, 2 * H:3 * H])

        # ---- chunk-level weight-gradient accumulation (all rows masked) ----
        # the chunk's deltas are READ BACK from the (VMEM-resident) scratch
        # block and the scan-previous h/c rows are rebuilt from the h/c
        # blocks + the neighbor chunk's boundary row — keeping per-row f32
        # value lists alive across the unrolled loop blew Mosaic's
        # scoped-vmem stack (observed 18.7M > 16M in f32)
        da_flat = dac_scr[...].reshape(CH * B, 4 * H)
        P = x_ref.shape[-1]
        dwin_ref[0] += _kdot(
            x_ref[...].reshape(CH * B, P), da_flat.astype(x_ref.dtype),
            (((0,), (0,)), ((), ())), precision, use3)

        def scan_prev_rows(full, bound, edge0):
            """[CH, B, H] scan-previous rows: shift within the chunk, the
            boundary row from the neighbor chunk's scan-final output
            (at the sequence edge: the explicit carry, or zeros)."""
            if ascending_scan:
                interior = (chunk > 0)
            else:
                interior = (chunk < NC - 1)
            if edge0 is None:
                bv = bound * interior.astype(jnp.float32)
            else:
                bv = jnp.where(interior, bound, edge0)
            if ascending_scan:
                return jnp.concatenate(
                    [bv[None], full[:CH - 1].astype(jnp.float32)], axis=0)
            return jnp.concatenate(
                [full[1:].astype(jnp.float32), bv[None]], axis=0)

        h0_val = h0_ref[0].astype(jnp.float32) if carry else None
        c0_val = c0_ref[0].astype(jnp.float32) if carry else None
        h_prev = scan_prev_rows(h_ref[...], hb_ref[0, 0].astype(jnp.float32),
                                h0_val)
        dwrec_ref[0] += _kdot(
            h_prev.reshape(CH * B, H).astype(w.dtype), da_flat.astype(w.dtype),
            (((0,), (0,)), ((), ())), precision, use3)
        cprev_flat = scan_prev_rows(c_ref[0], cb_ref[0, 0],
                                    c0_val).reshape(CH * B, H)
        c_flat = c_ref[0].reshape(CH * B, H)
        da_f32 = da_flat.astype(jnp.float32)
        dpeep_ref[0, 0] += jnp.sum(cprev_flat * da_f32[:, 1 * H:2 * H], axis=0)
        dpeep_ref[0, 1] += jnp.sum(cprev_flat * da_f32[:, 2 * H:3 * H], axis=0)
        dpeep_ref[0, 2] += jnp.sum(c_flat * da_f32[:, 3 * H:4 * H], axis=0)
        dbias_ref[0, 0, :] += jnp.sum(da_f32, axis=0)

        # ---- preceding-layer error for this chunk (plErrors GEMMs,
        # LstmLayer.cu:990-1009): one [CH*B, 4H] x [P, 4H]^T MXU matmul
        # over the resident deltas; per-direction planes, summed outside
        if dx_ref is not None:
            dx_ref[0] = _kdot(
                da_flat, w_in_ref[0],
                (((1,), (1,)), ((), ())), precision,
                use3).reshape(CH, B, P).astype(dx_ref.dtype)

    # d=0's scan ascends time -> BPTT walks the chunk descending; d=1's scan
    # descends -> BPTT ascends
    @pl.when(d + dir_offset == 0)
    def _():
        run(range(CH - 1, -1, -1), True)

    @pl.when(d + dir_offset != 0)
    def _():
        run(range(CH), False)


def _storage(compute_dtype):
    return (jnp.dtype(jnp.bfloat16)
            if jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16)
            else jnp.dtype(jnp.float32))


def fused_padded_dims(hdim: int, pdim: int, bsz: int, t: int,
                      compute_dtype, time_pad: bool = True):
    """The fused kernels' padded operand dims (hp, pp, bp, tp) — THE
    padding contract, in one place: cells and input features to 128
    lanes, batch rows to the storage dtype's sublane granule (16 for
    bf16, 8 for f32), time to a DEFAULT_CHUNK multiple. Shared by the
    operand-padding prologue (models/lstm._pad_fused_operands), the
    streaming mask-probe guard (lstm_forward_streaming), and the CLI's
    eager serving-shape probe — probe keys and serving shapes must be
    computed by the SAME rules or recorded device verdicts silently stop
    matching the points serving actually dispatches."""
    hp = round_up(hdim, 128)
    pp = round_up(pdim, 128)
    bp = round_up(bsz, batch_granule(compute_dtype))
    tp = round_up(t, DEFAULT_CHUNK) if time_pad else t
    return hp, pp, bp, tp


def batch_granule(compute_dtype) -> int:
    """Sublane granule for fraction/batch rows in the fused kernels: 16
    for 2-byte storage (bf16), 8 for f32 — part of fused_padded_dims'
    padding contract, exported so eager probe sites (trainer/cli) derive
    bp from the SAME rule instead of re-rolling it."""
    return 16 if _storage(compute_dtype).itemsize == 2 else 8


# Budgets for the analytic model, anchored at DEVICE-VALIDATED points (the
# model underestimates Mosaic's scoped-vmem stack, f32 worse than bf16):
# bf16 — flagship CH=16 (model 8.6M) and hp=256 CH=8 (model 10.7M) both
# compile+run, so 12M; f32 — flagship CH=8 (model 7.4M) OVERFLOWED on
# device (17.7M observed) while CH=4 (model 4.8M) runs, so 6M.
VMEM_BUDGET = {2: 12 * 1024 * 1024, 4: 6 * 1024 * 1024}

# Set only by ops/vmem_probe.py while AOT-compiling a candidate chunk size;
# forces pick_chunk's answer so the probe measures exactly that chunk.
_chunk_override = None


def _mask_lane_pad(ch: int) -> int:
    """Lane-padded minor width of the per-chunk step-mask block. Mosaic's
    tile rule requires a block's last dim be a multiple of 128 (or the full
    array dim) — round 4's device run died in the Pallas TPU lowering pass
    on an unpadded (B, CH=16) mask block exactly here. Module-level (not
    inlined) so the mask probe's regression test can recreate that bug by
    monkeypatching it to the identity and assert the probe REJECTS the
    layout (tests/test_vmem_probe.py)."""
    return -(-ch // 128) * 128


def fused_vmem_bytes(hp: int, pp: int, bp: int, compute_dtype=jnp.float32,
                     ch: int = DEFAULT_CHUNK, with_mask: bool = False,
                     carry: bool = False) -> int:
    """Worst-case VMEM residency of the fused kernels (the backward kernel
    dominates): double-buffered chunk streams + resident weights + the f32
    dW accumulator blocks + scratch. Used by pick_chunk and the callers'
    fall-back-to-scan guards — interpret-mode tests cannot catch device
    VMEM overflows.

    with_mask: the streaming step_mask adds one double-buffered [B, CH]
    f32 input block whose minor (CH) dim Mosaic lane-pads to 128 —
    2*bp*128*4 bytes (64 KB at bp=64). It rides the INFERENCE forward
    only (gradients with step_mask raise), which is far below the
    backward-dominated residency the device probes validate, so maskless
    probe verdicts remain safe for masked serving."""
    s = _storage(compute_dtype).itemsize
    h4 = 4 * hp
    fwd = (2 * s * (pp * h4 + hp * h4)              # W_in + W_rec
           + 2 * ch * bp * (s * (pp + hp + h4) + 4 * hp)  # x, h, gates, c
           + 4 * ch * bp * h4                        # a_all f32 temp
           + 4 * bp * 2 * hp)                        # scratch
    if with_mask:
        fwd += 2 * bp * _mask_lane_pad(ch) * 4       # lane-padded step mask
    bwd = (2 * s * (hp + pp) * h4                    # W_rec + W_in resident
           + 4 * (pp * h4 + hp * h4)                 # dW_in + dW_rec accum
           + 2 * ch * bp * (s * (2 * pp + 2 * hp + h4) + 4 * hp)  # streams
           + ch * bp * h4 * s                        # delta scratch
           + 4 * bp * (h4 + 2 * hp))                 # carry scratch
    if carry:
        # the GRADIENT of the carry-capable kernel (lstm_scan_fused_carry:
        # sequence parallelism's block scans) adds explicit-state blocks to
        # the backward: h0/c0 inputs, incoming (dhf, dcf) cotangents,
        # (dh0, dc0) outputs — f32 [bp, hp] each, plus forward-side
        # (h0, c0, hf, cf). Probe verdicts for this footprint live in
        # their own key family (vmem_probe "|cr").
        bwd += 10 * 4 * bp * hp
    return max(fwd, bwd)


def pick_chunk(T: int, hp: int, pp: int, bp: int,
               compute_dtype=jnp.float32, with_mask: bool = False,
               carry: bool = False) -> int:
    """Largest chunk that divides T AND whose kernel residency fits the
    VMEM budget (wide cells shrink the chunk instead of losing the fused
    path; callers fall back to lax.scan only when even the smallest chunk
    cannot fit — see fused_fits).

    The analytic model underestimates Mosaic's scoped-vmem stack (unrolled
    per-step liveness is scheduler-dependent), so the starting cap is
    DEVICE-VALIDATED per storage dtype on the flagship shapes: bf16
    CH=16 compiles and runs; f32 CH=8 was observed to overflow (17.7M >
    16M scoped vmem), f32 caps at 4. The model then handles width scaling
    relative to those anchors. Shape points PROBED on this device
    (ops/vmem_probe.py — Trainer init probes new shapes eagerly) override
    the model entirely. Probe verdicts stay valid for with_mask serving:
    they compile the full fwd+bwd kernels, whose backward residency
    dominates the inference-only masked forward by MBs (see
    fused_vmem_bytes).

    carry: the GRADIENT of the carry-capable kernel has a larger backward
    footprint (explicit-state blocks) — its verdicts live in a separate
    probe family ("|cr" keys) and the analytic model adds the extra
    blocks, so a carry-less verdict at the VMEM edge cannot be silently
    reused for sequence-parallel training. Inference streaming (primal
    only) keeps carry=False: the lean masked forward stays far below the
    backward-dominated bound the plain verdicts validate."""
    if _chunk_override is not None:
        if T % _chunk_override:
            raise ValueError(
                f"chunk override {_chunk_override} does not divide T={T}")
        return _log_chunk(_chunk_override, "override", T, hp, pp, bp,
                          compute_dtype)
    from lstm_rnn_tpu.ops.vmem_probe import lookup_chunk
    probed = lookup_chunk(T, hp, pp, bp, compute_dtype, carry=carry)
    if probed is not None:
        return _log_chunk(probed, "device-probe", T, hp, pp, bp,
                          compute_dtype)
    sz = _storage(compute_dtype).itemsize
    budget = VMEM_BUDGET[sz]
    ch = DEFAULT_CHUNK if sz == 2 else 4
    while T % ch:
        ch //= 2
    ch = max(ch, 1)
    while ch > 1 and fused_vmem_bytes(hp, pp, bp, compute_dtype,
                                      ch, with_mask, carry) > budget:
        ch //= 2
        while ch > 1 and T % ch:
            ch //= 2
    return _log_chunk(max(ch, 1), "analytic", T, hp, pp, bp, compute_dtype)


def _log_chunk(ch: int, source: str, T: int, hp: int, pp: int, bp: int,
               compute_dtype) -> int:
    """Opt-in chunk-choice trace (LSTM_RNN_TPU_DEBUG_CHUNK=1): names the
    verdict source and the analytic VMEM estimate, the first things needed
    when a Mosaic 'scoped allocation ... exceeded' AOT failure must be
    attributed to a shape point."""
    if os.environ.get("LSTM_RNN_TPU_DEBUG_CHUNK"):
        est = fused_vmem_bytes(hp, pp, bp, compute_dtype, ch)
        print(f"lstm_cell: chunk={ch} [{source}] for (T={T}, h={hp}, "
              f"p={pp}, b={bp}, {jnp.dtype(compute_dtype).name}); model "
              f"estimate {est / 2**20:.1f} MiB", flush=True)
    return ch


def fused_fits(hp: int, pp: int, bp: int, compute_dtype=jnp.float32,
               carry: bool = False) -> bool:
    """True when the fused kernels can run at SOME chunk size."""
    budget = VMEM_BUDGET[_storage(compute_dtype).itemsize]
    return fused_vmem_bytes(hp, pp, bp, compute_dtype, 1,
                            carry=carry) <= budget


def _precision_of(compute_dtype):
    return (jax.lax.Precision.DEFAULT
            if jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16)
            else jax.lax.Precision.HIGHEST)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def lstm_scan_fused(x, w_in, w_rec, peep, bias, lengths,
                    bias_mult: float = 1.0, clip: bool = True,
                    interpret: bool = False, compute_dtype=jnp.float32,
                    need_dx: bool = True):
    """Fused LSTM scan with in-kernel input projection.

    x [T,B,P] natural order, w_in [D,P,4H], bias [D,4H] (the kernel adds
    bias_mult*bias) -> h [T,B,D*H] ([fw|bw] per frame, already in the next
    layer's layout) in the storage dtype (bf16 in bf16 mode).
    need_dx=False (first hidden layer: x is the data) makes the backward
    kernel skip the preceding-layer-error output and return a symbolic
    zero cotangent for x.
    """
    h, *_ = _fwd_impl(x, w_in, w_rec, peep, bias, lengths, bias_mult,
                      interpret, compute_dtype, want_residuals=False)
    return h


def _fwd_impl(x, w_in, w_rec, peep, bias, lengths, bias_mult, interpret,
              compute_dtype, want_residuals=True, carry=None, carry_t=None,
              dir_offset=0, step_mask=None):
    T, B, P = x.shape
    D, _, H4 = w_in.shape
    H = H4 // 4
    # the chunk must agree with _bwd_impl's selection for the SAME call
    # (residual layout): gradient-bearing carry calls (want_residuals)
    # use the carry footprint; the inference primal keeps the plain one
    CH = pick_chunk(T, H, P, B, compute_dtype,
                    with_mask=step_mask is not None,
                    carry=carry is not None and want_residuals)
    NC = T // CH
    sdtype = _storage(compute_dtype)
    prec = _precision_of(compute_dtype)
    if carry is not None and (D == 2 or dir_offset == 1) \
            and carry_t is not None and carry_t != T:
        # a descending direction ENTERS at t=T-1: trailing chunk-alignment
        # padding (carry_t < T) sits at its entry and the step mask would
        # zero the incoming carry before the first real frame — carry_t
        # only relocates the d=0 CAPTURE, it cannot move the d=1 entry
        raise ValueError(
            "descending-direction carries (D == 2 or dir_offset == 1) "
            f"require carry_t == T (got carry_t={carry_t}, T={T}): pad the "
            "chunk before chaining, or chain ascending directions only")
    lengths_2d = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None], (B, 128))

    xs = x.astype(compute_dtype)
    w_in_c = w_in.astype(compute_dtype)
    w_rec_c = w_rec.astype(compute_dtype)

    idx = _dir_index(NC, False, dir_offset)
    carry_specs = ([_block((1, B, H), lambda d, k: (d, 0, 0))] * 2
                   if carry is not None else [])
    carry_ins = ((carry[0].astype(jnp.float32),
                  carry[1].astype(jnp.float32))
                 if carry is not None else ())
    # per-chunk lane-padded mask rows: (B, T) -> (NC, B, CHP) so the block's
    # minor dim is 128-aligned for any chunk size (fused_vmem_bytes already
    # charges the padded width)
    chp = _mask_lane_pad(CH)
    mask_specs = ([_block((1, B, chp),
                          lambda d, k: (_chunk_of(d + dir_offset, k, NC,
                                                  False), 0, 0))]
                  if step_mask is not None else [])
    mask_ins = ((jnp.pad(step_mask.astype(jnp.float32)
                         .reshape(B, NC, CH).transpose(1, 0, 2),
                         ((0, 0), (0, 0), (0, chp - CH))),)
                if step_mask is not None else ())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(D, NC),
        in_specs=[
            _block((B, 128), lambda d, k: (0, 0)),
        ] + mask_specs + [
            _block((CH, B, P), _x_index(NC, False, dir_offset)),
            _block((1, P, H4), lambda d, k: (d, 0, 0)),
            _block((1, H, H4), lambda d, k: (d, 0, 0)),
            _block((1, 3, H), lambda d, k: (d, 0, 0)),
            _block((D, H4), lambda d, k: (0, 0)),
        ] + carry_specs,
        out_specs=[
            # h written straight into the NEXT layer's [T, B, D*H] layout
            # (block column d) — no [fw|bw] concatenation ever materializes
            _block((CH, B, H),
                   lambda d, k: (_chunk_of(d + dir_offset, k, NC, False),
                                 0, d)),
        ] + ([
            _block((1, CH, B, H), idx),
            _block((1, CH, B, H4), idx),
            _block((1, 1, B, H),
                   lambda d, k: (d, _chunk_of(d + dir_offset, k, NC, False),
                                 0, 0)),
            _block((1, 1, B, H),
                   lambda d, k: (d, _chunk_of(d + dir_offset, k, NC, False),
                                 0, 0)),
        ] if want_residuals else []) + carry_specs,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, CH=CH, NC=NC,
                          bias_mult=bias_mult, precision=prec,
                          use3=_use3(compute_dtype),
                          fast=sdtype == jnp.dtype(jnp.bfloat16),
                          save=want_residuals, carry=carry is not None,
                          carry_t=T if carry_t is None else carry_t,
                          dir_offset=dir_offset,
                          with_mask=step_mask is not None),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D * H), sdtype),
        ] + ([
            jax.ShapeDtypeStruct((D, T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, T, B, H4), sdtype),
            jax.ShapeDtypeStruct((D, NC, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, NC, B, H), sdtype),
        ] if want_residuals else []) + ([
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
        ] if carry is not None else []),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * T * B * (P + H) * H4 + 14 * D * T * B * H,
            bytes_accessed=(2 * T * B * P * sdtype.itemsize
                            + D * T * B * (2 * H4 + 2 * H) * sdtype.itemsize
                            + 4 * D * T * B * H),
            transcendentals=4 * D * T * B * H,
        ),
    )(lengths_2d, *mask_ins, xs, w_in_c, w_rec_c, peep, bias, *carry_ins)
    final = (outs[-2], outs[-1]) if carry is not None else None
    if carry is not None:
        outs = outs[:-2]
    if not want_residuals:
        return outs[0], None, None, None, None, w_in_c, w_rec_c, final
    h, c, gates, cb, hb = outs
    return h, c, gates, cb, hb, w_in_c, w_rec_c, final


def _fused_fwd(x, w_in, w_rec, peep, bias, lengths, bias_mult, clip,
               interpret, compute_dtype, need_dx):
    h, c, gates, cb, hb, w_in_c, w_rec_c, _final = _fwd_impl(
        x, w_in, w_rec, peep, bias, lengths, bias_mult, interpret,
        compute_dtype)
    return h, (x, w_in_c, w_rec_c, peep, lengths, h, c, gates, cb, hb)


def _bwd_impl(bias_mult, clip, interpret, compute_dtype, need_dx,
              residuals, dh, carry=None, dfinal=None, carry_t=None,
              dir_offset=0):
    x, w_in_c, w_rec_c, peep, lengths, h, c, gates, cb, hb = residuals
    T, B, _ = h.shape
    D, P, H4 = w_in_c.shape
    H = H4 // 4
    CH = pick_chunk(T, H, P, B, compute_dtype, carry=carry is not None)
    NC = T // CH
    sdtype = _storage(compute_dtype)
    prec = _precision_of(compute_dtype)
    lengths_2d = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None], (B, 128))

    idx = _dir_index(NC, True, dir_offset)
    carry_spec = _block((1, B, H), lambda d, k: (d, 0, 0))
    carry_ins = ()
    if carry is not None:
        carry_ins = tuple(a.astype(jnp.float32)
                          for a in (*carry, *dfinal))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(D, NC),
        in_specs=[
            _block((B, 128), lambda d, k: (0, 0)),
            _block((CH, B, P), _x_index(NC, True, dir_offset)),  # layer input
            _block((CH, B, H),
                   lambda d, k: (_chunk_of(d + dir_offset, k, NC, True),
                                 0, d)),  # dh (direction column)
            _block((1, CH, B, H4), idx),    # saved gates
            _block((1, CH, B, H), idx),     # c
            _block((1, 1, B, H), _nb_index(NC, dir_offset)),  # prev chunk c
            _block((CH, B, H),
                   lambda d, k: (_chunk_of(d + dir_offset, k, NC, True),
                                 0, d)),  # h (for dW_rec)
            _block((1, 1, B, H), _nb_index(NC, dir_offset)),  # prev chunk h
            _block((1, P, H4), lambda d, k: (d, 0, 0)),  # W_in (for dx)
            _block((1, H, H4), lambda d, k: (d, 0, 0)),
            _block((1, 3, H), lambda d, k: (d, 0, 0)),
        ] + [carry_spec] * len(carry_ins),  # h0, c0, dhf, dcf
        out_specs=([
            # per-direction preceding-layer error planes (summed outside)
            _block((1, CH, B, P), idx),
        ] if need_dx else []) + [
            _block((1, P, H4), lambda d, k: (d, 0, 0)),   # dW_in accum
            _block((1, H, H4), lambda d, k: (d, 0, 0)),   # dW_rec accum
            _block((1, 3, H), lambda d, k: (d, 0, 0)),    # dpeep accum
            _block((1, 1, H4), lambda d, k: (d, 0, 0)),   # dbias accum
        ] + ([carry_spec] * 2 if carry is not None else []),  # dh0, dc0
        scratch_shapes=[
            pltpu.VMEM((CH, B, H4), sdtype),   # the chunk's deltas
            pltpu.VMEM((B, H4), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, CH=CH, NC=NC, clip=clip,
                          precision=prec, use3=_use3(compute_dtype),
                          fast=sdtype == jnp.dtype(jnp.bfloat16),
                          with_dx=need_dx, carry=carry is not None,
                          carry_t=T if carry_t is None else carry_t,
                          dir_offset=dir_offset),
        grid_spec=grid_spec,
        out_shape=([
            jax.ShapeDtypeStruct((D, T, B, P), sdtype),
        ] if need_dx else []) + [
            jax.ShapeDtypeStruct((D, P, H4), jnp.float32),
            jax.ShapeDtypeStruct((D, H, H4), jnp.float32),
            jax.ShapeDtypeStruct((D, 3, H), jnp.float32),
            jax.ShapeDtypeStruct((D, 1, H4), jnp.float32),
        ] + ([
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
        ] if carry is not None else []),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * T * B * (2 * H + 2 * P) * H4 + 30 * D * T * B * H,
            bytes_accessed=(D * T * B * (H4 + 2 * H + P) * sdtype.itemsize
                            + 2 * T * B * P * sdtype.itemsize
                            + 4 * D * T * B * H),
            transcendentals=D * T * B * H,
        ),
    )(lengths_2d, x.astype(compute_dtype), dh.astype(sdtype), gates, c, cb,
      h, hb, w_in_c, w_rec_c, peep, *carry_ins)

    dcarry = None
    if carry is not None:
        dcarry = (outs[-2], outs[-1])
        outs = outs[:-2]
    if need_dx:
        dxd, dw_in, dw_rec, dpeep, dbias = outs
        dx = (jnp.sum(dxd.astype(jnp.float32), axis=0) if D > 1
              else dxd[0].astype(jnp.float32)).astype(x.dtype)
    else:
        dw_in, dw_rec, dpeep, dbias = outs
        dx = jnp.zeros_like(x)  # symbolic zero; DCE'd (x is the data)
    dbias = bias_mult * dbias[:, 0, :]
    return dx, dw_in, dw_rec, dpeep, dbias, dcarry


def _fused_bwd(bias_mult, clip, interpret, compute_dtype, need_dx,
               residuals, dh):
    dx, dw_in, dw_rec, dpeep, dbias, _ = _bwd_impl(
        bias_mult, clip, interpret, compute_dtype, need_dx, residuals, dh)
    return dx, dw_in, dw_rec, dpeep, dbias, None


lstm_scan_fused.defvjp(_fused_fwd, _fused_bwd)


# ------------------------------------------------------------- carry variant
@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def lstm_scan_fused_carry(x, w_in, w_rec, peep, bias, lengths, h0, c0,
                          bias_mult: float = 1.0, clip: bool = True,
                          interpret: bool = False, compute_dtype=jnp.float32,
                          need_dx: bool = True, carry_t: int = None,
                          dir_offset: int = 0, step_mask=None):
    """Fused LSTM scan from an explicit initial state, emitting the final
    state — the primitive behind streaming inference (Network.apply_streaming
    chunks) and sequence parallelism's per-device block scans
    (parallel/sequence.py), which chain block scans through (h, c) carries.

    h0, c0: [D, B, H] f32 initial state per direction (d=0 enters at t=0,
    d=1 — the BLSTM backward half — at t=T-1). Returns (h [T, B, D*H] in
    the storage dtype, (hf, cf) [D, B, H] f32 scan-final state, masked to
    0 for rows past their length — exactly the chained-lax.scan carry).
    Gradients flow to h0/c0; with zero carries the gradients equal
    lstm_scan_fused's exactly (tested).

    carry_t (static, default T): the timestep count of the REAL chunk when
    trailing chunk-alignment padding was added — the d=0 final state is
    captured at step carry_t-1 (padding steps are masked and would zero a
    mid-stream carry).

    dir_offset=1 (static; D must be 1) runs the single direction as the
    DESCENDING scan over natural-order arrays — sequence parallelism's
    block scan for the BLSTM backward half: the carry then ENTERS at
    t=T-1 and the final state is the masked state at t=0. Descending
    directions reject carry_t != T (the trailing padding would sit at
    their ENTRY and zero the incoming carry — _fwd_impl raises).

    step_mask (optional, [B, T] 1.0/0.0): PER-STEP validity replacing the
    prefix-only `lengths` masking — streaming chunks where a sequence
    ends and another starts inside one chunk (mid-chunk NONE gaps) need
    it for scan parity. INFERENCE-ONLY: the backward kernels reason in
    suffix masks, so taking gradients with a step_mask raises."""
    h, _, _, _, _, _, _, final = _fwd_impl(
        x, w_in, w_rec, peep, bias, lengths, bias_mult, interpret,
        compute_dtype, want_residuals=False, carry=(h0, c0),
        carry_t=carry_t, dir_offset=dir_offset, step_mask=step_mask)
    return h, final


def _fused_carry_fwd(x, w_in, w_rec, peep, bias, lengths, h0, c0, bias_mult,
                     clip, interpret, compute_dtype, need_dx, carry_t,
                     dir_offset, step_mask=None):
    if step_mask is not None:
        # the backward kernels compute their masks as length suffixes
        # (scan_prev_rows / fg_delta edges) — a general per-step mask has
        # no gradient path; fail loudly at trace time instead of silently
        # producing prefix-masked gradients for step-masked data
        raise NotImplementedError(
            "lstm_scan_fused_carry(step_mask=...) is inference-only; "
            "training paths must express validity as prefix lengths")
    h, c, gates, cb, hb, w_in_c, w_rec_c, final = _fwd_impl(
        x, w_in, w_rec, peep, bias, lengths, bias_mult, interpret,
        compute_dtype, carry=(h0, c0), carry_t=carry_t,
        dir_offset=dir_offset)
    return (h, final), (x, w_in_c, w_rec_c, peep, lengths, h, c, gates, cb,
                        hb, h0, c0)


def _fused_carry_bwd(bias_mult, clip, interpret, compute_dtype, need_dx,
                     carry_t, dir_offset, residuals, cts):
    *res, h0, c0 = residuals
    dh, (dhf, dcf) = cts
    dx, dw_in, dw_rec, dpeep, dbias, dcarry = _bwd_impl(
        bias_mult, clip, interpret, compute_dtype, need_dx, tuple(res), dh,
        carry=(h0, c0), dfinal=(dhf, dcf), carry_t=carry_t,
        dir_offset=dir_offset)
    dh0, dc0 = dcarry
    # trailing None: step_mask's cotangent (inference-only; fwd raised if
    # it was ever set under differentiation)
    return (dx, dw_in, dw_rec, dpeep, dbias, None,
            dh0.astype(h0.dtype), dc0.astype(c0.dtype), None)


lstm_scan_fused_carry.defvjp(_fused_carry_fwd, _fused_carry_bwd)
