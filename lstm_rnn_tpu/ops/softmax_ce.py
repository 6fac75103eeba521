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


def _safe_exp(x):
    e = jnp.exp(jnp.clip(x, LOG_ZERO, EXP_LIMIT))
    e = jnp.where(x >= EXP_LIMIT, jnp.full_like(x, REAL_MAX), e)
    return jnp.where(x <= LOG_ZERO, jnp.zeros_like(x), e)


def _row_probs(a, S: int):
    """CURRENNT softmax over the real lanes of one [R, Sp] block (f32)."""
    Sp = a.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    real = col < S
    a = jnp.where(real, a, LOG_ZERO)
    mn = jnp.min(jnp.where(real, a, jnp.inf), axis=-1, keepdims=True)
    # the reference's max search STARTS at FLT_MIN (SoftmaxLayer.cu:60)
    mx = jnp.maximum(jnp.max(a, axis=-1, keepdims=True), REAL_MIN)
    e = _safe_exp(a - 0.5 * (mn + mx))
    return e / jnp.sum(e, axis=-1, keepdims=True), col


def _fwd_kernel(a_ref, tc_ref, p_ref, loss_ref, cnt_ref, *, S):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        loss_ref[...] = jnp.zeros_like(loss_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    p, col = _row_probs(a_ref[...].astype(jnp.float32), S)
    p_ref[...] = p.astype(p_ref.dtype)

    tc = tc_ref[...]  # [R, 1] int32; -1 = dummy
    valid = (tc >= 0).astype(jnp.float32)
    onehot = (col == tc).astype(jnp.float32)  # zero everywhere for tc < 0
    p_c = jnp.maximum(jnp.sum(p * onehot, axis=-1, keepdims=True), REAL_MIN)
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


def _bwd_kernel(p_ref, tc_ref, g_ref, dz_ref, *, S):
    p = p_ref[...].astype(jnp.float32)
    tc = tc_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    onehot = (col == tc).astype(jnp.float32)
    p_c = jnp.maximum(jnp.sum(p * onehot, axis=-1, keepdims=True), REAL_MIN)
    # err[target] = -1/p_c; s = sum(p * err) = -p_target / p_c
    inv = -1.0 / p_c
    s = jnp.sum(p * onehot, axis=-1, keepdims=True) * inv
    valid = (tc >= 0).astype(jnp.float32)
    dz = p * (onehot * inv - s) * valid * g_ref[0, 0]
    dz_ref[...] = dz.astype(dz_ref.dtype)


def _blockspec(shape, idx):
    return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def softmax_ce_fused(a, targets, S: int, interpret: bool = False,
                     store_dtype=jnp.float32):
    loss, cnt, _ = _fwd_impl(a, targets, S, interpret, store_dtype)
    return loss, cnt


def _fwd_impl(a, targets, S, interpret, store_dtype):
    N, Sp = a.shape
    rows = _ROWS
    while N % rows:
        rows //= 2
    grid = (N // rows,)
    p, loss, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S),
        grid=grid,
        in_specs=[_blockspec((rows, Sp), lambda k: (k, 0)),
                  _blockspec((rows, 1), lambda k: (k, 0))],
        out_specs=[_blockspec((rows, Sp), lambda k: (k, 0)),
                   _blockspec((1, 128), lambda k: (0, 0)),
                   _blockspec((1, 128), lambda k: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, Sp), jnp.dtype(store_dtype)),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        interpret=interpret,
    )(a, targets)
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
    rows = _ROWS
    while N % rows:
        rows //= 2
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
