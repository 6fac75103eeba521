"""Fused softmax + multiclass-CE + accuracy Pallas kernel (TPU fast path).

The reference computes the classification tail as two layers: SoftmaxLayer
(4 passes: (min+max)/2 offset, safeExp, row sum, normalize —
SoftmaxLayer.cu:45-78,251-315) and MulticlassClassificationLayer (gathered
-log p[target] loss, argmax accuracy counter, and a gradient that is the
softmax Jacobian applied to err[target] = -1/p[target] —
MulticlassClassificationLayer.cu:195-240, SoftmaxLayer.cu:317-353). Under
XLA that chain is several full passes over the [T,B,S] probability tensor
in HBM. This kernel runs the whole tail in VMEM:

- forward: one pass over the logits per row block — masked min/max for the
  CURRENNT offset (padded lanes excluded), safeExp, row sum, p = e/sum
  written once (the backward's residual), the target probability picked by
  an arithmetic one-hot (no gather), loss -log(max(p_c, REAL_MIN)) and the
  first-argmax == target counter accumulated into revisited scalar blocks;
- backward: dz = g * p .* (err - sum(p*err)) built from p and the one-hot
  in a single pass, with sum(p*err) = -p_c / max(p_c, REAL_MIN) (exactly
  the reference's Jacobian given the single nonzero err entry).

Gate-exact semantics: rows with target < 0 (dummy frames) contribute
nothing to loss, count, or gradient. Logit lanes >= S are ignored by the
offset and produce p = 0 (their inputs are forced to LOG_ZERO so safeExp
returns exactly 0), so callers may pad S to the 128-lane tile freely.

Shapes: a [N, Sp] logits (N = T*B rows, Sp = roundup(S, 128)),
targets [N, 1] int32. Returns (loss scalar f32, correct count i32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lstm_rnn_tpu.ops.activations import EXP_LIMIT, LOG_ZERO, REAL_MAX, REAL_MIN

# rows per program: big blocks amortize per-grid-step overhead (256-row
# blocks measured ~0.6 ms/step of pure grid overhead on the flagship);
# [2048, 256] f32 in + bf16 out is ~3 MB of VMEM streams, well in budget
_ROWS = 2048

# Conservative slice of Mosaic's ~16 MiB scoped-VMEM stack (same figure the
# LSTM kernels budget against, ops/lstm_cell.py VMEM_BUDGET). The row caps
# below keep the flagship shapes (Sp=256) at their measured block sizes and
# only shrink for wide softmax layers (LVCSR-scale state counts), where the
# uncapped [2048, Sp] f32 temporaries would fail at device compile with a
# Mosaic scoped-allocation overflow.
_VMEM_BUDGET = 12 * 1024 * 1024

# live [rows, Sp] f32 values in a tail kernel body (logits cast, masked
# offset operand, safeExp output, probabilities, one-hot, product — Mosaic
# fuses some, 6 is the conservative count that still admits [2048, 256])
_F32_STREAMS = 6

# Set only by ops/vmem_probe.py while AOT-compiling a candidate row block;
# forces the row pickers' answer so the probe measures exactly that block.
_rows_override = None


def _row_block(N: int, Sp: int, base: int = _ROWS,
               store_dtype=jnp.float32, analytic_only: bool = False) -> int:
    """Largest row block <= base that divides N and keeps the kernel's
    ~_F32_STREAMS live [rows, Sp] f32 temporaries inside the VMEM budget.
    A device-probed verdict (ops/vmem_probe.py), when recorded for this
    (Sp, dtype) point, overrides the analytic cap in either direction."""
    if _rows_override is not None:
        return _rows_override
    if not analytic_only:
        from lstm_rnn_tpu.ops.vmem_probe import lookup_tail_rows
        probed = lookup_tail_rows(N, 0, Sp, store_dtype, proj=False)
        if probed is not None:
            return min(probed, base)
    cap = max(1, _VMEM_BUDGET // (4 * _F32_STREAMS * Sp))
    rows = base
    while rows > cap:
        rows //= 2
    while N % rows:
        rows //= 2
    return rows


def _safe_exp(x):
    e = jnp.exp(jnp.clip(x, LOG_ZERO, EXP_LIMIT))
    e = jnp.where(x >= EXP_LIMIT, jnp.full_like(x, REAL_MAX), e)
    return jnp.where(x <= LOG_ZERO, jnp.zeros_like(x), e)


def _row_probs(a, S: int):
    """CURRENNT softmax over the real lanes of one [R, Sp] block (f32).
    Returns (p, col, off, ssum) — the offset/sum are the wide tail's
    per-row residuals (backward recomputes p from the logits block)."""
    Sp = a.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    real = col < S
    a = jnp.where(real, a, LOG_ZERO)
    mn = jnp.min(jnp.where(real, a, jnp.inf), axis=-1, keepdims=True)
    # the reference's max search STARTS at FLT_MIN (SoftmaxLayer.cu:60)
    mx = jnp.maximum(jnp.max(a, axis=-1, keepdims=True), REAL_MIN)
    off = 0.5 * (mn + mx)
    e = _safe_exp(a - off)
    ssum = jnp.sum(e, axis=-1, keepdims=True)
    return e / ssum, col, off, ssum


def _tail_fwd_body(a, tc_ref, p_ref, loss_ref, cnt_ref, *, S, first_step,
                   stats_refs=None):
    """Shared forward tail from f32 logits `a` [R, Sp]: write p (p_ref=None
    on the inference path: no residual store), accumulate the block's loss
    and correct-count partials. stats_refs=(off, sum, pt) — the wide tail's
    tiny per-row residuals written INSTEAD of the [N, Sp] p tensor."""
    @pl.when(first_step)
    def _():
        loss_ref[...] = jnp.zeros_like(loss_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    p, col, off, ssum = _row_probs(a, S)
    if p_ref is not None:
        p_ref[...] = p.astype(p_ref.dtype)

    tc = tc_ref[...]  # [R, 1] int32; -1 = dummy
    valid = (tc >= 0).astype(jnp.float32)
    onehot = (col == tc).astype(jnp.float32)  # zero everywhere for tc < 0
    p_t = jnp.sum(p * onehot, axis=-1, keepdims=True)
    if stats_refs is not None:
        off_ref, sum_ref, pt_ref = stats_refs
        off_ref[...] = off
        sum_ref[...] = ssum
        pt_ref[...] = p_t
    p_c = jnp.maximum(p_t, REAL_MIN)
    # Mosaic cannot store scalars to VMEM: accumulate the block partial
    # into every lane of a [1, 128] vector (any lane then holds the total)
    loss_ref[...] += jnp.full(loss_ref.shape, -jnp.sum(jnp.log(p_c) * valid),
                              jnp.float32)

    # first argmax (the reference scans ascending with a strict '>', so
    # ties resolve to the lowest index) == target
    m = jnp.max(p, axis=-1, keepdims=True)
    first = jnp.min(jnp.where(p == m, col, p.shape[-1]), axis=-1,
                    keepdims=True)
    cnt_ref[...] += jnp.full(cnt_ref.shape, jnp.sum(
        jnp.where(tc >= 0, (first == tc).astype(jnp.int32), 0)), jnp.int32)


def _tail_dz(p_ref, tc_ref, g_ref, *, S):
    """Shared backward: dz = g * p .* (err - sum(p*err)) from the stored
    probabilities (f32 [R, Sp])."""
    p = p_ref[...].astype(jnp.float32)
    tc = tc_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    onehot = (col == tc).astype(jnp.float32)
    p_c = jnp.maximum(jnp.sum(p * onehot, axis=-1, keepdims=True), REAL_MIN)
    # err[target] = -1/p_c; s = sum(p * err) = -p_target / p_c
    inv = -1.0 / p_c
    s = jnp.sum(p * onehot, axis=-1, keepdims=True) * inv
    valid = (tc >= 0).astype(jnp.float32)
    return p * (onehot * inv - s) * valid * g_ref[0, 0]


def _fwd_kernel(a_ref, tc_ref, *rest, S, want_p):
    p_ref, loss_ref, cnt_ref = rest if want_p else (None,) + rest
    _tail_fwd_body(a_ref[...].astype(jnp.float32), tc_ref, p_ref, loss_ref,
                   cnt_ref, S=S, first_step=pl.program_id(0) == 0)


def _bwd_kernel(p_ref, tc_ref, g_ref, dz_ref, *, S):
    dz_ref[...] = _tail_dz(p_ref, tc_ref, g_ref, S=S).astype(dz_ref.dtype)


def _blockspec(shape, idx):
    return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def softmax_ce_fused(a, targets, S: int, interpret: bool = False,
                     store_dtype=jnp.float32):
    loss, cnt, _ = _fwd_impl(a, targets, S, interpret, store_dtype,
                             want_p=False)
    return loss, cnt


def _fwd_impl(a, targets, S, interpret, store_dtype, want_p=True):
    N, Sp = a.shape
    rows = _row_block(N, Sp, store_dtype=store_dtype)
    grid = (N // rows,)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, want_p=want_p),
        grid=grid,
        in_specs=[_blockspec((rows, Sp), lambda k: (k, 0)),
                  _blockspec((rows, 1), lambda k: (k, 0))],
        out_specs=([_blockspec((rows, Sp), lambda k: (k, 0))] if want_p
                   else []) +
                  [_blockspec((1, 128), lambda k: (0, 0)),
                   _blockspec((1, 128), lambda k: (0, 0))],
        out_shape=([jax.ShapeDtypeStruct((N, Sp), jnp.dtype(store_dtype))]
                   if want_p else []) +
                  [jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        interpret=interpret,
    )(a, targets)
    p = outs[0] if want_p else None
    loss, cnt = outs[-2], outs[-1]
    return loss[0, 0], cnt[0, 0], p


def _fused_fwd(a, targets, S, interpret, store_dtype):
    loss, cnt, p = _fwd_impl(a, targets, S, interpret, store_dtype)
    # residuals must be jax values: a zero-size token carries a's dtype
    return (loss, cnt), (p, targets, jnp.zeros((0,), a.dtype))


def _fused_bwd(S, interpret, store_dtype, res, cts):
    g_loss, _g_cnt = cts
    p, targets, dtype_token = res
    a_dtype = dtype_token.dtype
    N, Sp = p.shape
    rows = _row_block(N, Sp, store_dtype=store_dtype)
    grid = (N // rows,)
    g = jnp.reshape(g_loss.astype(jnp.float32), (1, 1))
    dz = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S),
        grid=grid,
        in_specs=[_blockspec((rows, Sp), lambda k: (k, 0)),
                  _blockspec((rows, 1), lambda k: (k, 0)),
                  _blockspec((1, 1), lambda k: (0, 0))],
        out_specs=_blockspec((rows, Sp), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Sp), a_dtype),
        interpret=interpret,
    )(p, targets, g)
    return dz, None


softmax_ce_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# Projection-fused variant: the softmax layer's feedforward-identity matmul
# (FeedForwardLayer.cu:144-153 / SoftmaxLayer's base part) runs IN-KERNEL,
# so the [N, Sp] logits never exist in HBM either — forward reads h and W,
# writes only p; backward reads p/h/W and writes dh + the [P, Sp] dW / db
# accumulated into revisited VMEM blocks (the dz tensor never hits HBM).
# Requires P % 128 == 0 (the padded training view guarantees it).
# ~1024-row blocks keep the f32 temporaries inside the VMEM budget.
_PROJ_ROWS = 1024


def _pick_rows(N: int, rows: int) -> int:
    while N % rows:
        rows //= 2
    return rows


def _proj_fixed_bytes(P: int, Sp: int, itemsize: int) -> int:
    """Row-independent VMEM residents of the proj kernels (the backward,
    the larger of the pair): the W block, a working copy for the f32 hi/lo
    matmul decomposition, and the [P, Sp] f32 dW accumulator block."""
    return P * Sp * (2 * itemsize + 4)


def _proj_row_bytes(P: int, Sp: int, itemsize: int) -> int:
    """Per-row VMEM of the proj kernels: the [rows, Sp] f32 temporaries
    (probabilities, dz, one-hot chain) plus the [rows, P] h/dh blocks and
    a matmul accumulator."""
    return Sp * 4 * _F32_STREAMS + P * (2 * itemsize + 4)


def _proj_rows(N: int, P: int, Sp: int, compute_dtype,
               analytic_only: bool = False) -> int:
    from lstm_rnn_tpu.ops.lstm_cell import _storage
    itemsize = jnp.dtype(_storage(compute_dtype)).itemsize
    if _rows_override is not None:
        return _rows_override
    if not analytic_only:
        from lstm_rnn_tpu.ops.vmem_probe import lookup_tail_rows
        probed = lookup_tail_rows(N, P, Sp, compute_dtype, proj=True)
        if probed is not None:
            return min(probed, _PROJ_ROWS)
    fixed = _proj_fixed_bytes(P, Sp, itemsize)
    if fixed >= _VMEM_BUDGET:
        return min(8, _pick_rows(N, 8))
    cap = max(1, (_VMEM_BUDGET - fixed) // _proj_row_bytes(P, Sp, itemsize))
    rows = _PROJ_ROWS
    while rows > cap:
        rows //= 2
    return _pick_rows(N, rows)


def prefer_proj_tail(N: int, P: int, Sp: int, S: int,
                     compute_dtype=jnp.float32) -> bool:
    """Given that the proj tail FITS, should it be routed over the wide
    tail? Per-step streaming overheads: proj restreams the [P, Sp] W
    once per row block (N/rows reads), wide restreams the [N, P] h once
    per column block (Sp/SB reads) — both equal N*P*Sp*iz divided by
    their block size, so the LARGER block wins. Route proj iff its row
    block >= the wide plan's column block (ties prefer proj: no extra
    XLA matmuls and the logits never exist in HBM); when no wide plan
    exists at this (P, dtype), proj wins by default.

    This gate exists because fitting is not winning: device probing
    recorded that the proj tail COMPILES at LVCSR scale in bf16 with a
    32-row block (tpu_tail2.log) — routing it there would restream the
    5 MB W a thousand times per step, far slower than the measured
    2.30M frames/s wide path. Deliberately ignores
    LSTM_RNN_TPU_DISABLE_WIDE_TAIL: under that A/B env the caller's
    wide branch raises, so a False here falls through to the
    documented materialized-logits fallback."""
    try:
        _spw, sb, _rows = wide_plan(N, P, S, compute_dtype)
    except ValueError:
        return True
    # N-independent on purpose (same principle as proj_tail_fits):
    # divisibility shrinking of the row block for a particular fraction
    # shape must not flap the ROUTE — compare the nominal blocks
    return _proj_rows(1 << 20, P, Sp, compute_dtype) >= sb


def proj_tail_fits(N: int, P: int, Sp: int, compute_dtype=jnp.float32) -> bool:
    """True when the projection-fused tail can run at SOME useful row block.

    Wide softmax layers (LVCSR-scale state counts) make the [P, Sp] weight
    and dW-accumulator blocks alone exceed the scoped-VMEM budget — those
    nets must fall back to materialized logits + softmax_ce_fused (whose
    row blocks shrink with Sp and always fit). Callers gate on this before
    choosing softmax_ce_proj_fused (Network.loss_and_count_fused).
    Device-probed verdicts (ops/vmem_probe.py, recorded eagerly by the
    Trainer on real TPUs) take priority over the analytic model in both
    directions."""
    from lstm_rnn_tpu.ops.lstm_cell import _storage
    from lstm_rnn_tpu.ops.vmem_probe import lookup_tail_rows, tail_known_unfit
    if tail_known_unfit(P, Sp, compute_dtype, proj=True):
        return False
    probed = lookup_tail_rows(N, P, Sp, compute_dtype, proj=True)
    if probed is not None:
        # a positive verdict at ANY rows admits every smaller block (the
        # failure modes are the row-independent W/dW residents) — N's
        # divisibility shrinking the block must not flip the decision
        return True
    # analytic: can the kernel run at the sublane-granularity block?
    # N-independent on purpose — different fraction shapes of one net must
    # not flap between the proj and plain tails
    itemsize = jnp.dtype(_storage(compute_dtype)).itemsize
    used = _proj_fixed_bytes(P, Sp, itemsize) \
        + 8 * _proj_row_bytes(P, Sp, itemsize)
    return used <= _VMEM_BUDGET


def _fwd_proj_kernel(h_ref, w_ref, b_ref, tc_ref, *rest,
                     S, bias_mult, precision, use3, want_p):
    from lstm_rnn_tpu.ops.lstm_cell import _kdot
    p_ref, loss_ref, cnt_ref = rest if want_p else (None,) + rest
    a = _kdot(h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
              precision, use3)
    a = a + bias_mult * b_ref[...].astype(jnp.float32)
    _tail_fwd_body(a, tc_ref, p_ref, loss_ref, cnt_ref, S=S,
                   first_step=pl.program_id(0) == 0)


def _bwd_proj_kernel(p_ref, h_ref, w_ref, tc_ref, g_ref,
                     dh_ref, dw_ref, db_ref, *, S, precision, use3):
    from lstm_rnn_tpu.ops.lstm_cell import _kdot
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dz = _tail_dz(p_ref, tc_ref, g_ref, S=S)
    dzc = dz.astype(h_ref.dtype)
    # preceding-layer error: dh = dz . W^T (one MXU matmul per block)
    dh_ref[...] = _kdot(dzc, w_ref[...], (((1,), (1,)), ((), ())),
                        precision, use3).astype(dh_ref.dtype)
    # dW = h^T dz, db = colsum dz — accumulated into revisited blocks
    dw_ref[...] += _kdot(h_ref[...], dzc, (((0,), (0,)), ((), ())),
                         precision, use3)
    db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def softmax_ce_proj_fused(h2, W, b, targets, S: int, bias_mult: float,
                          interpret: bool = False,
                          compute_dtype=jnp.float32):
    """Fused (identity-feedforward -> softmax -> CE -> accuracy) tail.

    h2 [N, P] (P % 128 == 0), W [P, Sp], b [1, Sp] (caller pads S -> Sp
    with zero columns; padded logits are ignored by construction), targets
    [N, 1] int32. Returns (loss scalar f32, correct count i32); gradients
    flow to h2, W and b."""
    (loss, cnt), _ = _proj_fwd_impl(h2, W, b, targets, S, bias_mult,
                                    interpret, compute_dtype, want_p=False)
    return loss, cnt


def _proj_fwd_impl(h2, W, b, targets, S, bias_mult, interpret,
                   compute_dtype, want_p=True):
    from lstm_rnn_tpu.ops.lstm_cell import (_precision_of, _storage, _use3)
    N, P = h2.shape
    Sp = W.shape[1]
    sdtype = _storage(compute_dtype)
    rows = _proj_rows(N, P, Sp, compute_dtype)
    grid = (N // rows,)
    hc = h2.astype(sdtype)
    wc = W.astype(sdtype)
    outs = pl.pallas_call(
        functools.partial(_fwd_proj_kernel, S=S, bias_mult=bias_mult,
                          precision=_precision_of(compute_dtype),
                          use3=_use3(compute_dtype), want_p=want_p),
        grid=grid,
        in_specs=[_blockspec((rows, P), lambda k: (k, 0)),
                  _blockspec((P, Sp), lambda k: (0, 0)),
                  _blockspec((1, Sp), lambda k: (0, 0)),
                  _blockspec((rows, 1), lambda k: (k, 0))],
        out_specs=([_blockspec((rows, Sp), lambda k: (k, 0))] if want_p
                   else []) +
                  [_blockspec((1, 128), lambda k: (0, 0)),
                   _blockspec((1, 128), lambda k: (0, 0))],
        out_shape=([jax.ShapeDtypeStruct((N, Sp), sdtype)] if want_p
                   else []) +
                  [jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        interpret=interpret,
    )(hc, wc, b.reshape(1, Sp).astype(jnp.float32), targets)
    p = outs[0] if want_p else None
    loss, cnt = outs[-2], outs[-1]
    return (loss[0, 0], cnt[0, 0]), (p, hc, wc, targets)


def _proj_fused_fwd(h2, W, b, targets, S, bias_mult, interpret,
                    compute_dtype):
    (loss, cnt), (p, hc, wc, tc) = _proj_fwd_impl(
        h2, W, b, targets, S, bias_mult, interpret, compute_dtype)
    return (loss, cnt), (p, hc, wc, tc,
                         jnp.zeros((0,), h2.dtype), jnp.zeros((0,), W.dtype))


def _proj_fused_bwd(S, bias_mult, interpret, compute_dtype, res, cts):
    from lstm_rnn_tpu.ops.lstm_cell import (_precision_of, _storage, _use3)
    g_loss, _g_cnt = cts
    p, hc, wc, targets, h_token, w_token = res
    N, P = hc.shape
    Sp = p.shape[1]
    sdtype = _storage(compute_dtype)
    rows = _proj_rows(N, P, Sp, compute_dtype)
    grid = (N // rows,)
    g = jnp.reshape(g_loss.astype(jnp.float32), (1, 1))
    dh, dw, db = pl.pallas_call(
        functools.partial(_bwd_proj_kernel, S=S,
                          precision=_precision_of(compute_dtype),
                          use3=_use3(compute_dtype)),
        grid=grid,
        in_specs=[_blockspec((rows, Sp), lambda k: (k, 0)),
                  _blockspec((rows, P), lambda k: (k, 0)),
                  _blockspec((P, Sp), lambda k: (0, 0)),
                  _blockspec((rows, 1), lambda k: (k, 0)),
                  _blockspec((1, 1), lambda k: (0, 0))],
        out_specs=[_blockspec((rows, P), lambda k: (k, 0)),
                   _blockspec((P, Sp), lambda k: (0, 0)),
                   _blockspec((1, Sp), lambda k: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, P), sdtype),
                   jax.ShapeDtypeStruct((P, Sp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Sp), jnp.float32)],
        interpret=interpret,
    )(p, hc, wc, targets, g)
    return (dh.astype(h_token.dtype), dw.astype(w_token.dtype),
            bias_mult * db[0], None)


softmax_ce_proj_fused.defvjp(_proj_fused_fwd, _proj_fused_bwd)


# --------------------------------------------------------------------------
# Wide (LVCSR-scale) variant: when Sp is in the thousands the proj-fused
# kernels cannot hold their [P, Sp] W / dW blocks in VMEM (proj_tail_fits
# rejects them). The previous recourse — materialized logits + the plain
# fused tail — paid three [N, Sp]-sized residual/intermediate streams (the
# p residual, and dz read twice by the outside dh/dW matmuls). This variant
# keeps the forward's single XLA projection matmul (optimal MXU tiling for
# a [N, P] x [P, Sp] problem — a row-blocked in-kernel matmul would restream
# W N/rows times), but:
#
# - forward: a row-blocked Pallas pass over the logits emits loss/count and
#   THREE [N, 1] per-row stats (CURRENNT offset, exp-sum, target prob) —
#   the [N, Sp] probability tensor never exists; the logits themselves are
#   the residual (stored once, in the storage dtype);
# - backward: ONE kernel on an (Sp-blocks, row-blocks) grid recomputes each
#   p block from the logits + stats (VPU only — bit-identical: the stats
#   were computed from the same rounded logits), builds dz in-block, writes
#   it once, and accumulates dW / db into REVISITED [P, SB] column blocks
#   (the same revisit trick as the LSTM kernels' dW_in,
#   ops/lstm_cell.py). dh = dz . W^T runs as one XLA matmul outside.
#
# Per step this removes ~3 [N, Sp] HBM streams vs the fallback and never
# holds more than [P, SB] of dW in VMEM, so it scales to any state count.

_WIDE_ROWS = 256   # backward row block (VMEM-fitted by wide_plan)
_WIDE_SB = 1024    # backward Sp column block

# Set only by ops/vmem_probe.py while AOT-compiling a candidate (SB, rows)
# point; forces wide_plan's blocks so the probe measures exactly them.
_wide_override = None


def _wide_analytic(P: int, compute_dtype):
    """Analytic (SB, rows) for the wide backward kernel:
      fixed   = P*SB*4 (the dW accumulator block)
      per-row = SB*(2*itemsize + 5*4) (a + dz blocks, ~5 f32 temps)
                + P*itemsize (the h block)
    """
    from lstm_rnn_tpu.ops.lstm_cell import _storage
    item = jnp.dtype(_storage(compute_dtype)).itemsize
    for sb in (_WIDE_SB, 512, 256, 128):
        fixed = P * sb * 4
        per_row = sb * (2 * item + 5 * 4) + P * item
        cap = (_VMEM_BUDGET - fixed) // per_row if fixed < _VMEM_BUDGET else 0
        rows = _WIDE_ROWS
        while rows > max(cap, 0):
            rows //= 2
        if rows >= (64 if sb > 128 else 8):
            return sb, rows
    return None


def wide_plan(N: int, P: int, S: int, compute_dtype=jnp.float32,
              analytic_only: bool = False):
    """(Sp_w, SB, rows) for the wide tail at this shape point: SB divides
    Sp_w (S is padded UP to a multiple of SB — callers pad W/b/logits with
    zero columns, masked by construction), and the backward kernel's
    resident set fits the VMEM budget. A device-probed verdict for this
    (P, dtype) point (ops/vmem_probe.py), when recorded, overrides the
    analytic model in both directions; a recorded no-blocks-fit verdict
    raises (callers fall back to materialized logits + the plain tail)."""
    if _wide_override is not None:
        sb, rows = _wide_override
        return -(-S // sb) * sb, sb, _pick_rows(N, rows)
    pick = None
    if not analytic_only:
        from lstm_rnn_tpu.ops.vmem_probe import (lookup_wide_blocks,
                                                 wide_known_unfit)
        if wide_known_unfit(P, compute_dtype):
            raise ValueError(
                f"wide softmax tail: device probe recorded no (SB, rows) "
                f"block fits for P={P}")
        pick = lookup_wide_blocks(P, compute_dtype)
    if pick is None:
        pick = _wide_analytic(P, compute_dtype)
    if pick is None:
        raise ValueError(
            f"wide softmax tail cannot fit any (SB, rows) block for P={P}")
    sb, rows = pick
    spw = -(-S // sb) * sb
    if not analytic_only:
        # the wide FORWARD is the plain row-blocked tail at Spw: if the
        # device probe recorded that NO row block fits there (the trainer
        # probes exactly this point, trainer.py wide_ok demotion), routing
        # wide would die at the first step's Mosaic compile — raise so
        # callers fall back to materialized logits + the plain tail at Sp
        from lstm_rnn_tpu.ops.vmem_probe import tail_known_unfit
        if tail_known_unfit(0, spw, compute_dtype, proj=False):
            raise ValueError(
                f"wide softmax tail: device probe recorded no forward row "
                f"block fits at padded width Spw={spw}")
    return spw, sb, _pick_rows(N, rows)


def _fwd_wide_kernel(a_ref, tc_ref, loss_ref, cnt_ref, off_ref, sum_ref,
                     pt_ref, *, S):
    _tail_fwd_body(a_ref[...].astype(jnp.float32), tc_ref, None, loss_ref,
                   cnt_ref, S=S, first_step=pl.program_id(0) == 0,
                   stats_refs=(off_ref, sum_ref, pt_ref))


def _bwd_wide_kernel(a_ref, h_ref, tc_ref, off_ref, sum_ref, pt_ref, g_ref,
                     dz_ref, dw_ref, db_ref, *, S, SB, precision, use3):
    from lstm_rnn_tpu.ops.lstm_cell import _kdot
    s = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    a = a_ref[...].astype(jnp.float32)
    col = s * SB + jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    e = jnp.where(col < S, _safe_exp(a - off_ref[...]), 0.0)
    p = e / sum_ref[...]
    tc = tc_ref[...]
    onehot = (col == tc).astype(jnp.float32)
    p_c = jnp.maximum(pt_ref[...], REAL_MIN)
    inv = -1.0 / p_c
    srow = pt_ref[...] * inv
    valid = (tc >= 0).astype(jnp.float32)
    dz = p * (onehot * inv - srow) * valid * g_ref[0, 0]
    dzc = dz.astype(dz_ref.dtype)
    dz_ref[...] = dzc
    # dW / db accumulate into the REVISITED per-column blocks (r is the
    # inner grid axis, so each (s, *) sweep keeps its block in VMEM)
    dw_ref[...] += _kdot(h_ref[...], dzc, (((0,), (0,)), ((), ())),
                         precision, use3)
    db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def softmax_ce_wide_fused(h2, W, b, targets, S: int, bias_mult: float,
                          interpret: bool = False,
                          compute_dtype=jnp.float32):
    """LVCSR-scale fused tail: h2 [N, P] (P % 128 == 0), W [P, Sp_w],
    b [Sp_w] (caller pads to wide_plan's Sp_w with zero columns), targets
    [N, 1] int32. Returns (loss f32, correct count i32); gradients flow to
    h2, W, b. Reference hot path: SoftmaxLayer.cu:251-353 +
    MulticlassClassificationLayer.cu:195-240."""
    (loss, cnt), _ = _wide_fwd_impl(h2, W, b, targets, S, bias_mult,
                                    interpret, compute_dtype)
    return loss, cnt


def _wide_fwd_impl(h2, W, b, targets, S, bias_mult, interpret,
                   compute_dtype):
    from lstm_rnn_tpu.ops.lstm_cell import (_kdot, _precision_of, _storage,
                                            _use3)
    N, P = h2.shape
    Spw = W.shape[1]
    sdtype = _storage(compute_dtype)
    hc = h2.astype(sdtype)
    wc = W.astype(sdtype)
    # ONE XLA projection matmul (the optimal tiling for this shape); the
    # tail consumes the ROUNDED logits so the backward recompute of p from
    # the stored a is bit-identical to the forward's stats
    a = _kdot(hc, wc, (((1,), (0,)), ((), ())),
              _precision_of(compute_dtype), _use3(compute_dtype))
    a = (a + bias_mult * b.astype(jnp.float32)).astype(sdtype)
    rows = _row_block(N, Spw, store_dtype=compute_dtype)
    grid = (N // rows,)
    stat = jax.ShapeDtypeStruct((N, 1), jnp.float32)
    loss, cnt, off, ssum, pt = pl.pallas_call(
        functools.partial(_fwd_wide_kernel, S=S),
        grid=grid,
        in_specs=[_blockspec((rows, Spw), lambda k: (k, 0)),
                  _blockspec((rows, 1), lambda k: (k, 0))],
        out_specs=[_blockspec((1, 128), lambda k: (0, 0)),
                   _blockspec((1, 128), lambda k: (0, 0)),
                   _blockspec((rows, 1), lambda k: (k, 0)),
                   _blockspec((rows, 1), lambda k: (k, 0)),
                   _blockspec((rows, 1), lambda k: (k, 0))],
        out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32),
                   stat, stat, stat],
        interpret=interpret,
    )(a, targets)
    return (loss[0, 0], cnt[0, 0]), (a, hc, wc, targets, off, ssum, pt)


def _wide_fused_fwd(h2, W, b, targets, S, bias_mult, interpret,
                    compute_dtype):
    (loss, cnt), res = _wide_fwd_impl(h2, W, b, targets, S, bias_mult,
                                      interpret, compute_dtype)
    return (loss, cnt), res + (jnp.zeros((0,), h2.dtype),
                               jnp.zeros((0,), W.dtype))


def _wide_fused_bwd(S, bias_mult, interpret, compute_dtype, res, cts):
    from lstm_rnn_tpu.ops.lstm_cell import (_kdot, _precision_of, _storage,
                                            _use3)
    g_loss, _g_cnt = cts
    a, hc, wc, targets, off, ssum, pt, h_token, w_token = res
    N, P = hc.shape
    Spw = a.shape[1]
    sdtype = _storage(compute_dtype)
    _spw, SB, rows = wide_plan(N, P, Spw, compute_dtype)
    while Spw % SB:
        # the caller padded Spw for a different SB (e.g. a probe verdict
        # landed between trace and grad); Spw is always a 128 multiple
        SB //= 2
    grid = (Spw // SB, N // rows)
    g = jnp.reshape(g_loss.astype(jnp.float32), (1, 1))
    stat_spec = _blockspec((rows, 1), lambda s, r: (r, 0))
    dz, dw, db = pl.pallas_call(
        functools.partial(_bwd_wide_kernel, S=S, SB=SB,
                          precision=_precision_of(compute_dtype),
                          use3=_use3(compute_dtype)),
        grid=grid,
        in_specs=[_blockspec((rows, SB), lambda s, r: (r, s)),
                  _blockspec((rows, P), lambda s, r: (r, 0)),
                  stat_spec, stat_spec, stat_spec, stat_spec,
                  _blockspec((1, 1), lambda s, r: (0, 0))],
        out_specs=[_blockspec((rows, SB), lambda s, r: (r, s)),
                   _blockspec((P, SB), lambda s, r: (0, s)),
                   _blockspec((1, SB), lambda s, r: (0, s))],
        out_shape=[jax.ShapeDtypeStruct((N, Spw), sdtype),
                   jax.ShapeDtypeStruct((P, Spw), jnp.float32),
                   jax.ShapeDtypeStruct((1, Spw), jnp.float32)],
        interpret=interpret,
    )(a, hc, targets, off, ssum, pt, g)
    # preceding-layer error: one XLA matmul over the fresh dz
    dh = _kdot(dz, wc, (((1,), (1,)), ((), ())),
               _precision_of(compute_dtype), _use3(compute_dtype))
    return (dh.astype(h_token.dtype), dw.astype(w_token.dtype),
            bias_mult * db[0], None)


softmax_ce_wide_fused.defvjp(_wide_fused_fwd, _wide_fused_bwd)
