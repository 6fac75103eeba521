"""Fused Pallas LSTM scan kernel (TPU fast path).

The sequential recurrence is the only part of the LSTM that cannot be one
big MXU matmul (input projections are batched outside, like the reference's
time-batched GEMMs, LstmLayer.cu:772-786). `jax.lax.scan` compiles fine but
leaves per-step fusion/scheduling to XLA; this kernel instead runs the WHOLE
scan as one Mosaic program:

- grid (T/CH,): the Mosaic pipeline streams each chunk's input projections
  acts[:, t:t+CH] (HBM -> VMEM, double-buffered automatically) while the
  previous chunk computes; CH timesteps run unrolled per grid step;
- BOTH directions of a BLSTM are interleaved INSIDE the program: their
  recurrent chains are independent, so the d=1 matmul issues while d=0's
  elementwise tail is still in flight — twice the MXU occupancy of running
  directions as separate sequential programs;
- h/c live in VMEM scratch across the entire sequence (never round-trip to
  HBM between steps); the recurrent weights stay VMEM-resident;
- the cell's elementwise math (CURRENNT-exact: tanh2 = 2*sigma(2x)-1,
  peepholes incl. the og peephole from the NEW cell state) fuses with the
  [B, H] x [H, 4H] MXU matmul;
- variable-length masking is computed in-kernel from per-sequence lengths
  (padding is a suffix, DataSet.cpp fraction assembly), so no mask tensor is
  streamed;
- backward is a second Pallas kernel running the reference BPTT
  (ComputeBlockErrorsFn, LstmLayer.cu:190-287) in reverse grid order,
  recomputing gate activations from the stored h/c instead of saving four
  gate tensors (4x less HBM traffic), with the +-1 delta clipping and the
  unclipped-og-delta cell-state-error quirk reproduced exactly. Weight
  gradients then become big MXU einsums over the kernel's delta output
  (dW_in = x^T dA etc.), mirroring ComputeWeightUpdateFn's reductions.

Shapes: acts [D, T, B, 4H] float32 (bias already added; backward direction
already time-reversed), w_rec [D, H, 4H] (float32 or bfloat16 for MXU-native
fast math), peep [D, 3, H], lengths [B] int32. Requires H % 128 == 0 and
B % 8 == 0 — callers pad (zero-padding cells and batch rows is numerically
exact: padded cells output exactly 0 and receive exactly 0 gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lstm_rnn_tpu.ops.activations import logistic, tanh2

DEFAULT_CHUNK = 8


def _valid_mask(lengths_ref, d: int, t, T):
    """[B, 1] float mask at scan step t; d is a STATIC direction index
    (0 = forward: t < len; 1 = backward over reversed acts: t + len >= T)."""
    lens = lengths_ref[:, 0:1]  # [B, 1] int32
    if d == 0:
        return (lens > t).astype(jnp.float32)
    return ((lens + t) >= T).astype(jnp.float32)


def _fwd_kernel(lengths_ref, acts_ref, w_rec_ref, peep_ref,
                h_out_ref, c_out_ref, h_scr, c_scr, *, T, CH, D):
    """CH timesteps x D directions per grid step, fully unrolled; h/c carry
    across chunks in VMEM scratch."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    hs = [h_scr[d] for d in range(D)]
    cs = [c_scr[d] for d in range(D)]
    H = hs[0].shape[-1]

    for j in range(CH):
        t = k * CH + j
        for d in range(D):
            w = w_rec_ref[d]
            h, c = hs[d], cs[d]
            a = acts_ref[d, j] + jnp.dot(h.astype(w.dtype), w,
                                         preferred_element_type=jnp.float32)
            p_ig = peep_ref[d, 0:1, :]
            p_fg = peep_ref[d, 1:2, :]
            p_og = peep_ref[d, 2:3, :]
            ni = tanh2(a[:, 0 * H:1 * H])
            ig = logistic(a[:, 1 * H:2 * H] + c * p_ig)
            fg = logistic(a[:, 2 * H:3 * H] + c * p_fg)
            c_new = ni * ig + fg * c
            og = logistic(a[:, 3 * H:4 * H] + c_new * p_og)
            h_new = tanh2(c_new) * og

            m = _valid_mask(lengths_ref, d, t, T)
            hs[d] = h_new * m
            cs[d] = c_new * m
            h_out_ref[d, j] = hs[d]
            c_out_ref[d, j] = cs[d]

    for d in range(D):
        h_scr[d] = hs[d]
        c_scr[d] = cs[d]


def _bwd_kernel(lengths_ref, acts_ref, dh_ref, h_ref, h_prevchunk_ref,
                c_ref, c_prevchunk_ref, w_rec_ref, peep_ref, da_ref,
                da_scr, cse_scr, fg_scr, *, T, CH, D, clip):
    """Reverse-order BPTT, CH timesteps x D directions per grid step."""
    kg = pl.program_id(0)
    nc = pl.num_programs(0)
    k = nc - 1 - kg  # reversed chunk order

    @pl.when(kg == 0)
    def _():
        da_scr[...] = jnp.zeros_like(da_scr)
        cse_scr[...] = jnp.zeros_like(cse_scr)
        fg_scr[...] = jnp.zeros_like(fg_scr)

    H = cse_scr.shape[-1]
    da_next = [da_scr[d] for d in range(D)]
    cse_next = [cse_scr[d] for d in range(D)]
    fg_next = [fg_scr[d] for d in range(D)]

    for j in range(CH - 1, -1, -1):
        t = k * CH + j
        # arithmetic first-step mask: at t==0 there is no previous state
        not_first = (t > 0).astype(jnp.float32)
        for d in range(D):
            w = w_rec_ref[d]
            m = _valid_mask(lengths_ref, d, t, T)
            if j > 0:
                h_prev = h_ref[d, j - 1]
                c_prev = c_ref[d, j - 1]
            else:
                h_prev = h_prevchunk_ref[d, CH - 1] * not_first
                c_prev = c_prevchunk_ref[d, CH - 1] * not_first
            c = c_ref[d, j]

            # recompute gate activations (bit-identical to the forward)
            a = acts_ref[d, j] + jnp.dot(h_prev.astype(w.dtype), w,
                                         preferred_element_type=jnp.float32)
            p_ig = peep_ref[d, 0:1, :]
            p_fg = peep_ref[d, 1:2, :]
            p_og = peep_ref[d, 2:3, :]
            ni = tanh2(a[:, 0 * H:1 * H])
            ig = logistic(a[:, 1 * H:2 * H] + c_prev * p_ig)
            fg = logistic(a[:, 2 * H:3 * H] + c_prev * p_fg)
            og = logistic(a[:, 3 * H:4 * H] + c * p_og)

            # incoming dE/dh plus the recurrent term from the next scan step
            e = dh_ref[d, j] + jnp.dot(da_next[d].astype(w.dtype), w.T,
                                       preferred_element_type=jnp.float32)

            tanh_c = tanh2(c)
            og_delta = og * (1.0 - og) * tanh_c * e
            # NB: UNCLIPPED og delta here (LstmLayer.cu:246-250); next-step
            # ig/fg deltas are the CLIPPED stored ones, csErr is unclipped.
            cs_err = (og * (1.0 - tanh_c * tanh_c) * e + p_og * og_delta
                      + fg_next[d] * cse_next[d]
                      + p_ig * da_next[d][:, 1 * H:2 * H]
                      + p_fg * da_next[d][:, 2 * H:3 * H])

            ni_delta = ig * (1.0 - ni * ni) * cs_err
            fg_delta = fg * (1.0 - fg) * c_prev * cs_err * not_first
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
            da_next[d] = da
            cse_next[d] = cs_err * m
            fg_next[d] = fg * m
            da_ref[d, j] = da

    for d in range(D):
        da_scr[d] = da_next[d]
        cse_scr[d] = cse_next[d]
        fg_scr[d] = fg_next[d]


def _block(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _pick_chunk(T: int) -> int:
    ch = DEFAULT_CHUNK
    while T % ch:
        ch //= 2
    return max(ch, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_scan_fused(acts, w_rec, peep, lengths, clip: bool = True,
                    interpret: bool = False):
    """Fused LSTM scan. acts [D,T,B,4H] -> h [D,T,B,H]."""
    h, _ = _fwd_impl(acts, w_rec, peep, lengths, interpret)
    return h


def _fwd_impl(acts, w_rec, peep, lengths, interpret):
    D, T, B, H4 = acts.shape
    H = H4 // 4
    CH = _pick_chunk(T)
    lengths_2d = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None], (B, 128))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T // CH,),
        in_specs=[
            _block((B, 128), lambda k: (0, 0)),
            _block((D, CH, B, H4), lambda k: (0, k, 0, 0)),
            _block((D, H, H4), lambda k: (0, 0, 0)),
            _block((D, 3, H), lambda k: (0, 0, 0)),
        ],
        out_specs=[
            _block((D, CH, B, H), lambda k: (0, k, 0, 0)),
            _block((D, CH, B, H), lambda k: (0, k, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
    )
    h, c = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, CH=CH, D=D),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((D, T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, T, B, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * T * B * H * H4 + 14 * D * T * B * H,
            bytes_accessed=4 * D * T * B * (H4 + 2 * H),
            transcendentals=4 * D * T * B * H,
        ),
    )(lengths_2d, acts, w_rec, peep)
    return h, c


def _fused_fwd(acts, w_rec, peep, lengths, clip, interpret):
    h, c = _fwd_impl(acts, w_rec, peep, lengths, interpret)
    return h, (acts, w_rec, peep, lengths, h, c)


def _fused_bwd(clip, interpret, residuals, dh):
    acts, w_rec, peep, lengths, h, c = residuals
    D, T, B, H4 = acts.shape
    H = H4 // 4
    CH = _pick_chunk(T)
    NC = T // CH
    lengths_2d = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None], (B, 128))

    # chunk index maps (reversed order); prev = preceding chunk, clamped
    def cur_index(kg):
        return (0, NC - 1 - kg, 0, 0)

    def prev_index(kg):
        return (0, jnp.maximum(NC - 1 - kg - 1, 0), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NC,),
        in_specs=[
            _block((B, 128), lambda kg: (0, 0)),
            _block((D, CH, B, H4), cur_index),   # acts chunk
            _block((D, CH, B, H), cur_index),    # dh chunk
            _block((D, CH, B, H), cur_index),    # h chunk
            _block((D, CH, B, H), prev_index),   # h previous chunk
            _block((D, CH, B, H), cur_index),    # c chunk
            _block((D, CH, B, H), prev_index),   # c previous chunk
            _block((D, H, H4), lambda kg: (0, 0, 0)),
            _block((D, 3, H), lambda kg: (0, 0, 0)),
        ],
        out_specs=[
            _block((D, CH, B, H4), cur_index),   # dA chunk
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B, H4), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
    )
    (da,) = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, CH=CH, D=D, clip=clip),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((D, T, B, H4), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * D * T * B * H * H4 + 30 * D * T * B * H,
            bytes_accessed=4 * D * T * B * (2 * H4 + 4 * H),
            transcendentals=4 * D * T * B * H,
        ),
    )(lengths_2d, acts, dh, h, h, c, c, w_rec, peep)

    # weight gradients as big MXU reductions over the stored deltas
    # (ComputeWeightUpdateFn semantics):
    h_prev = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1)
    c_prev = jnp.concatenate([jnp.zeros_like(c[:, :1]), c[:, :-1]], axis=1)
    dw_rec = jnp.einsum("dtbh,dtbg->dhg", h_prev, da,
                        preferred_element_type=jnp.float32).astype(w_rec.dtype)
    dpeep = jnp.stack([
        jnp.einsum("dtbh,dtbh->dh", c_prev, da[..., 1 * H:2 * H]),
        jnp.einsum("dtbh,dtbh->dh", c_prev, da[..., 2 * H:3 * H]),
        jnp.einsum("dtbh,dtbh->dh", c, da[..., 3 * H:4 * H]),
    ], axis=1)
    return da, dw_rec, dpeep, None


lstm_scan_fused.defvjp(_fused_fwd, _fused_bwd)


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
