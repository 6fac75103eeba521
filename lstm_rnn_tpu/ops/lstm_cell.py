"""Fused Pallas LSTM scan kernel (TPU fast path).

The sequential recurrence is the only part of the LSTM that cannot be one
big MXU matmul (input projections are batched outside, like the reference's
time-batched GEMMs, LstmLayer.cu:772-786). `jax.lax.scan` compiles fine but
leaves per-step fusion/scheduling to XLA; this kernel instead runs the WHOLE
scan as one Mosaic program per direction:

- grid (D, T/CH): one program per (direction, time chunk); the Mosaic
  pipeline streams each chunk's operands (HBM -> VMEM, double-buffered)
  while the previous chunk computes; CH timesteps run unrolled per step;
- the BLSTM backward direction is handled purely through BLOCK INDEXING:
  its index maps walk the chunks in reverse ((1-d)*k + d*(NC-1-k)) and its
  inner loop walks each chunk's rows in reverse — NO time-reversed copies of
  activations are materialized, and all operands are the FULL [D, T, B, .]
  arrays (profiling showed per-direction slicing/concatenation costing
  multiple ms/step);
- h/c live in VMEM scratch across the sequence; the recurrent weights stay
  VMEM-resident; the cell math (CURRENNT-exact: tanh2 = 2*sigma(2x)-1,
  peepholes incl. the og peephole from the NEW cell state) fuses with the
  [B, H] x [H, 4H] MXU matmul;
- variable-length masking is computed in-kernel from per-sequence lengths.
  Padding is a suffix (DataSet.cpp fraction assembly), so validity is
  `t < length` for both directions in natural time order;
- the forward pass stores the post-activation gates; backward is a second
  Pallas kernel running the reference BPTT (ComputeBlockErrorsFn,
  LstmLayer.cu:190-287) over the saved gates — no gate recompute — with the
  +-1 delta clipping and the unclipped-og-delta cell-state-error quirk
  reproduced exactly. Weight gradients then become big MXU einsums over the
  kernel's delta output (dW_in = x^T dA etc.), mirroring
  ComputeWeightUpdateFn's reductions.

Shapes: acts [D, T, B, 4H] float32 in NATURAL time order for both
directions (bias already added), w_rec [D, H, 4H] (float32 or bfloat16 for
MXU-native fast math), peep [D, 3, H], lengths [B] int32. Returns h
[D, T, B, H] in natural time order. Requires H % 128 == 0, B % 8 == 0 and
T % chunk == 0 — callers pad (zero-padding cells, batch rows and trailing
timesteps is numerically exact: padded slots produce exactly 0 and receive
exactly 0 gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lstm_rnn_tpu.ops.activations import logistic, tanh2

DEFAULT_CHUNK = 8


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_chunk(T: int) -> int:
    ch = DEFAULT_CHUNK
    while T % ch:
        ch //= 2
    return max(ch, 1)


def _block(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _chunk_of(d, k, NC: int, reverse_scan: bool):
    """Chunk index for direction d at grid step k (both traced). d=0 scans
    natural time ascending, d=1 descending; BPTT kernels flip both."""
    fwd = (1 - d) * k + d * (NC - 1 - k)
    if reverse_scan:
        return (1 - d) * (NC - 1 - k) + d * k
    return fwd


def _dir_index(NC: int, reverse_scan: bool):
    return lambda d, k: (d, _chunk_of(d, k, NC, reverse_scan), 0, 0)


def _nb_index(NC: int):
    """BPTT: chunk holding direction d's forward-scan-previous neighbor —
    chunk-1 for d=0 (its scan ascends), chunk+1 for d=1 (clamped)."""
    def f(d, k):
        cur = _chunk_of(d, k, NC, True)
        return (d, jnp.clip(cur - 1 + 2 * d, 0, NC - 1), 0, 0)
    return f


def _valid(lengths_ref, t):
    """[B, 1] float validity at natural time t (padding is a suffix)."""
    return (lengths_ref[:, 0:1] > t).astype(jnp.float32)


def _fwd_kernel(lengths_ref, acts_ref, w_rec_ref, peep_ref, bias_ref,
                h_out_ref, c_out_ref, g_out_ref, h_scr, c_scr,
                *, T, CH, NC, bias_mult):
    """One direction's chunk per program. Blocks arrive pre-indexed (leading
    dim 1); the inner loop order and the mask time are direction-dependent."""
    d = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    H = h_scr.shape[-1]
    chunk = _chunk_of(d, k, NC, False)
    w = w_rec_ref[0]
    p_ig = peep_ref[0, 0:1, :]
    p_fg = peep_ref[0, 1:2, :]
    p_og = peep_ref[0, 2:3, :]
    # bias folded into the kernel (saves a [D,T,B,4H]-sized fused add);
    # bias_ref carries the full [D, 4H] block (Mosaic requires the
    # second-to-last block dim to be full or 8-divisible)
    bb = bias_ref[pl.ds(d, 1), :] * bias_mult

    def run(js):
        h = h_scr[...]
        c = c_scr[...]
        for j in js:
            t = chunk * CH + j
            a = acts_ref[0, j] + bb + jnp.dot(h.astype(w.dtype), w,
                                              preferred_element_type=jnp.float32)
            ni = tanh2(a[:, 0 * H:1 * H])
            ig = logistic(a[:, 1 * H:2 * H] + c * p_ig)
            fg = logistic(a[:, 2 * H:3 * H] + c * p_fg)
            c_new = ni * ig + fg * c
            og = logistic(a[:, 3 * H:4 * H] + c_new * p_og)
            h_new = tanh2(c_new) * og

            m = _valid(lengths_ref, t)
            h = h_new * m
            c = c_new * m
            h_out_ref[0, j] = h
            c_out_ref[0, j] = c
            g_out_ref[0, j] = jnp.concatenate([ni, ig, fg, og], axis=-1)
        h_scr[...] = h
        c_scr[...] = c

    @pl.when(d == 0)
    def _():
        run(range(CH))

    @pl.when(d != 0)
    def _():
        run(range(CH - 1, -1, -1))


def _bwd_kernel(lengths_ref, dh_ref, g_ref, c_ref, c_nb_ref,
                w_rec_ref, peep_ref, da_ref,
                da_scr, cse_scr, fg_scr, *, T, CH, NC, clip):
    """BPTT over saved gates, walking each direction's scan in reverse."""
    d = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        da_scr[...] = jnp.zeros_like(da_scr)
        cse_scr[...] = jnp.zeros_like(cse_scr)
        fg_scr[...] = jnp.zeros_like(fg_scr)

    H = cse_scr.shape[-1]
    chunk = _chunk_of(d, k, NC, True)
    w = w_rec_ref[0]
    p_ig = peep_ref[0, 0:1, :]
    p_fg = peep_ref[0, 1:2, :]
    p_og = peep_ref[0, 2:3, :]

    def run(js, ascending_scan):
        da_next = da_scr[...]
        cse_next = cse_scr[...]
        fg_next = fg_scr[...]
        for j in js:
            t = chunk * CH + j
            m = _valid(lengths_ref, t)
            # scan-previous neighbor: t-1 (ascending scan) or t+1 (descending)
            if ascending_scan:
                has_prev = (t > 0).astype(jnp.float32)
                c_prev = (c_ref[0, j - 1] if j > 0
                          else c_nb_ref[0, CH - 1] * has_prev)
            else:
                has_prev = (t < T - 1).astype(jnp.float32)
                c_prev = (c_ref[0, j + 1] if j < CH - 1
                          else c_nb_ref[0, 0] * has_prev)
            c = c_ref[0, j]
            gg = g_ref[0, j]
            ni = gg[:, 0 * H:1 * H]
            ig = gg[:, 1 * H:2 * H]
            fg = gg[:, 2 * H:3 * H]
            og = gg[:, 3 * H:4 * H]

            e = dh_ref[0, j] + jnp.dot(da_next.astype(w.dtype), w.T,
                                       preferred_element_type=jnp.float32)

            tanh_c = tanh2(c)
            og_delta = og * (1.0 - og) * tanh_c * e
            # NB: UNCLIPPED og delta here (LstmLayer.cu:246-250); next-step
            # ig/fg deltas are the CLIPPED stored ones, csErr is unclipped.
            cs_err = (og * (1.0 - tanh_c * tanh_c) * e + p_og * og_delta
                      + fg_next * cse_next
                      + p_ig * da_next[:, 1 * H:2 * H]
                      + p_fg * da_next[:, 2 * H:3 * H])

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
            da_ref[0, j] = da
        da_scr[...] = da_next
        cse_scr[...] = cse_next
        fg_scr[...] = fg_next

    # d=0's scan ascends time -> BPTT walks the chunk descending; d=1's scan
    # descends -> BPTT ascends
    @pl.when(d == 0)
    def _():
        run(range(CH - 1, -1, -1), True)

    @pl.when(d != 0)
    def _():
        run(range(CH), False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def lstm_scan_fused(acts, w_rec, peep, bias, lengths, bias_mult: float = 1.0,
                    clip: bool = True, interpret: bool = False):
    """Fused LSTM scan. acts [D,T,B,4H] natural order (WITHOUT bias; the
    kernel adds bias_mult*bias), bias [D,4H] -> h [D,T,B,H]."""
    h, _, _ = _fwd_impl(acts, w_rec, peep, bias, lengths, bias_mult, interpret)
    return h


def _fwd_impl(acts, w_rec, peep, bias, lengths, bias_mult, interpret):
    D, T, B, H4 = acts.shape
    H = H4 // 4
    CH = _pick_chunk(T)
    NC = T // CH
    lengths_2d = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None], (B, 128))

    idx = _dir_index(NC, False)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(D, NC),
        in_specs=[
            _block((B, 128), lambda d, k: (0, 0)),
            _block((1, CH, B, H4), idx),
            _block((1, H, H4), lambda d, k: (d, 0, 0)),
            _block((1, 3, H), lambda d, k: (d, 0, 0)),
            _block((D, H4), lambda d, k: (0, 0)),
        ],
        out_specs=[
            _block((1, CH, B, H), idx),
            _block((1, CH, B, H), idx),
            _block((1, CH, B, H4), idx),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    h, c, gates = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, CH=CH, NC=NC, bias_mult=bias_mult),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((D, T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, T, B, H4), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * T * B * H * H4 + 14 * D * T * B * H,
            bytes_accessed=4 * D * T * B * (2 * H4 + 2 * H),
            transcendentals=4 * D * T * B * H,
        ),
    )(lengths_2d, acts, w_rec, peep, bias)
    return h, c, gates


def _fused_fwd(acts, w_rec, peep, bias, lengths, bias_mult, clip, interpret):
    h, c, gates = _fwd_impl(acts, w_rec, peep, bias, lengths, bias_mult, interpret)
    return h, (w_rec, peep, lengths, h, c, gates)


def _fused_bwd(bias_mult, clip, interpret, residuals, dh):
    w_rec, peep, lengths, h, c, gates = residuals
    D, T, B, H = h.shape
    H4 = 4 * H
    CH = _pick_chunk(T)
    NC = T // CH
    lengths_2d = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None], (B, 128))

    idx = _dir_index(NC, True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(D, NC),
        in_specs=[
            _block((B, 128), lambda d, k: (0, 0)),
            _block((1, CH, B, H), idx),     # dh
            _block((1, CH, B, H4), idx),    # saved gates
            _block((1, CH, B, H), idx),     # c
            _block((1, CH, B, H), _nb_index(NC)),  # c neighbor chunk
            _block((1, H, H4), lambda d, k: (d, 0, 0)),
            _block((1, 3, H), lambda d, k: (d, 0, 0)),
        ],
        out_specs=[_block((1, CH, B, H4), idx)],
        scratch_shapes=[
            pltpu.VMEM((B, H4), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    (da,) = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, CH=CH, NC=NC, clip=clip),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((D, T, B, H4), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * D * T * B * H * H4 + 30 * D * T * B * H,
            bytes_accessed=4 * D * T * B * (2 * H4 + 3 * H),
            transcendentals=D * T * B * H,
        ),
    )(lengths_2d, dh, gates, c, c, w_rec, peep)

    # weight gradients as big MXU reductions over the stored deltas
    # (ComputeWeightUpdateFn semantics). The scan-previous output/cell state
    # is t-1 for the forward direction and t+1 for the backward one.
    def scan_prev(x):
        parts = [jnp.concatenate([jnp.zeros_like(x[0:1, :1]),
                                  x[0:1, :-1]], axis=1)]
        if x.shape[0] == 2:
            parts.append(jnp.concatenate([x[1:2, 1:],
                                          jnp.zeros_like(x[1:2, :1])], axis=1))
        return jnp.concatenate(parts, axis=0)

    h_prev = scan_prev(h)
    c_prev = scan_prev(c)
    dw_rec = jnp.einsum("dtbh,dtbg->dhg", h_prev, da,
                        preferred_element_type=jnp.float32).astype(w_rec.dtype)
    dpeep = jnp.stack([
        jnp.einsum("dtbh,dtbh->dh", c_prev, da[..., 1 * H:2 * H]),
        jnp.einsum("dtbh,dtbh->dh", c_prev, da[..., 2 * H:3 * H]),
        jnp.einsum("dtbh,dtbh->dh", c, da[..., 3 * H:4 * H]),
    ], axis=1)
    dbias = bias_mult * jnp.sum(da, axis=(1, 2))
    return da, dw_rec, dpeep, dbias, None


lstm_scan_fused.defvjp(_fused_fwd, _fused_bwd)
