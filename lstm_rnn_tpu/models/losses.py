"""Post-output (loss) layers with reference-exact values AND gradients.

The reference implements 7 post-output layers (LayerFactory.cu:66-87), each
with a hand-written error value and backward gradient. Several gradients are
deliberately NOT the analytic derivative of the error value (quirks noted
per-loss below), so every loss here is a `jax.custom_vjp` whose backward pass
injects the reference's exact `outputErrors`.

Conventions (all reproduce the reference):
- Inputs y are the output layer's activations [T, B, L]; padding slots
  (PATTYPE_NONE) contribute 0 to the error and 0 gradient.
- Error values are SUMS over the fraction (the trainer later normalizes by
  the number of sequences, Optimizer.cu:100).
- float limits follow NumericLimits.cuh (REAL_MIN = FLT_MIN).

Layer name aliases accepted, superset of the factory + README:
sse, weighted_sse/weightedsse, rmse, ce, sse_mask/wf, binary_classification,
multiclass_classification. (The reference factory's outer condition forgot
"sse_mask" and "weighted_sse", making the documented names throw,
LayerFactory.cu:66; we accept all documented spellings.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lstm_rnn_tpu.ops.activations import REAL_MIN


def _valid(pattypes, dtype):
    # [T, B] -> [T, B, 1] float mask
    return (pattypes != 0).astype(dtype)[..., None]


# --------------------------------------------------------------------------
# sse: E = 0.5*sum((t-y)^2), grad = y - t        (SsePostOutputLayer.cu)
# --------------------------------------------------------------------------

@jax.custom_vjp
def sse(y, targets, pattypes):
    m = _valid(pattypes, y.dtype)
    d = (targets - y) * m
    return 0.5 * jnp.sum(d * d)


def _sse_fwd(y, targets, pattypes):
    return sse(y, targets, pattypes), (y, targets, pattypes)


def _sse_bwd(res, g):
    y, targets, pattypes = res
    m = _valid(pattypes, y.dtype)
    return (g * (y - targets) * m, None, None)


sse.defvjp(_sse_fwd, _sse_bwd)


# --------------------------------------------------------------------------
# weighted_sse: targets interleaved (t, w); E = 0.5*sum(((y-t)*w)^2)
# grad = (y-t)*w  — note: missing the second w factor; reproduced as-is
# (WeightedSsePostOutputLayer.cu:61,89).
# --------------------------------------------------------------------------

@jax.custom_vjp
def weighted_sse(y, targets, pattypes):
    t = targets[..., 0::2]
    w = targets[..., 1::2]
    m = _valid(pattypes, y.dtype)
    d = (y - t) * w * m
    return 0.5 * jnp.sum(d * d)


def _wsse_fwd(y, targets, pattypes):
    return weighted_sse(y, targets, pattypes), (y, targets, pattypes)


def _wsse_bwd(res, g):
    y, targets, pattypes = res
    t = targets[..., 0::2]
    w = targets[..., 1::2]
    m = _valid(pattypes, y.dtype)
    return (g * (y - t) * w * m, None, None)


weighted_sse.defvjp(_wsse_fwd, _wsse_bwd)


# --------------------------------------------------------------------------
# rmse: per-pattern rmse = sqrt(mean((y-t)^2)); E = sum(rmse)
# grad = rmse * (y - t)  — reference quirk: not the analytic gradient
# (RmsePostOutputLayer.cu:93).
# --------------------------------------------------------------------------

def _rmses(y, targets, pattypes):
    m = (pattypes != 0).astype(y.dtype)  # [T, B]
    d = y - targets
    return jnp.sqrt(jnp.mean(d * d, axis=-1)) * m


@jax.custom_vjp
def rmse(y, targets, pattypes):
    return jnp.sum(_rmses(y, targets, pattypes))


def _rmse_fwd(y, targets, pattypes):
    return rmse(y, targets, pattypes), (y, targets, pattypes)


def _rmse_bwd(res, g):
    y, targets, pattypes = res
    r = _rmses(y, targets, pattypes)[..., None]
    return (g * r * (y - targets), None, None)


rmse.defvjp(_rmse_fwd, _rmse_bwd)


# --------------------------------------------------------------------------
# ce: dense-target KL divergence E = sum(t * log(max(t,eps)/max(y,eps)))
# grad = clamp(-t / max(y,eps), -100, 100)   (CePostOutputLayer.cu:61-96)
# --------------------------------------------------------------------------

@jax.custom_vjp
def ce(y, targets, pattypes):
    m = _valid(pattypes, y.dtype)
    ft = jnp.maximum(targets, REAL_MIN)
    fy = jnp.maximum(y, REAL_MIN)
    return jnp.sum(targets * jnp.log(ft / fy) * m)


def _ce_fwd(y, targets, pattypes):
    return ce(y, targets, pattypes), (y, targets, pattypes)


def _ce_bwd(res, g):
    y, targets, pattypes = res
    m = _valid(pattypes, y.dtype)
    fy = jnp.maximum(y, REAL_MIN)
    return (g * jnp.clip(-targets / fy, -100.0, 100.0) * m, None, None)


ce.defvjp(_ce_fwd, _ce_bwd)


# --------------------------------------------------------------------------
# sse_mask ("wf"): mask training. targets interleaved (o, i);
# E = 0.5*sum((y*i - o)^2); grad = (y*i - o)*i  (SseMaskPostOutputLayer.cu)
# --------------------------------------------------------------------------

@jax.custom_vjp
def sse_mask(y, targets, pattypes):
    o = targets[..., 0::2]
    fi = targets[..., 1::2]
    m = _valid(pattypes, y.dtype)
    d = (y * fi - o) * m
    return 0.5 * jnp.sum(d * d)


def _ssemask_fwd(y, targets, pattypes):
    return sse_mask(y, targets, pattypes), (y, targets, pattypes)


def _ssemask_bwd(res, g):
    y, targets, pattypes = res
    o = targets[..., 0::2]
    fi = targets[..., 1::2]
    m = _valid(pattypes, y.dtype)
    return (g * (y * fi - o) * fi * m, None, None)


sse_mask.defvjp(_ssemask_fwd, _ssemask_bwd)


# --------------------------------------------------------------------------
# binary_classification: layer size 1, logistic output; targets are int
# classes {0,1} (copied from targetClasses, BinaryClassificationLayer.cu:163).
# E = -sum(log(p_target)); grad = -1/p if target>0 else +1/(1-p)
# --------------------------------------------------------------------------

@jax.custom_vjp
def binary_classification(y, target_classes, pattypes):
    m = (pattypes != 0).astype(y.dtype)
    t = target_classes.astype(y.dtype)
    act = jnp.maximum(y[..., 0], REAL_MIN)
    # targetProb is NOT clamped (BinaryClassificationLayer.cu:61-63): a
    # confidently-wrong prediction (act == 1.0, target 0) reports +inf
    # epoch error exactly like the reference
    p = jnp.where(t > 0, act, 1.0 - act)
    return jnp.sum(-jnp.log(p) * m)


def _bc_fwd(y, target_classes, pattypes):
    return binary_classification(y, target_classes, pattypes), (y, target_classes, pattypes)


def _bc_bwd(res, g):
    y, target_classes, pattypes = res
    m = (pattypes != 0).astype(y.dtype)
    t = target_classes.astype(y.dtype)
    act = jnp.maximum(y[..., 0], REAL_MIN)
    p = jnp.where(t > 0, act, 1.0 - act)
    err = jnp.where(t > 0, -1.0 / p, 1.0 / p) * m
    return (g * err[..., None], None, None)


binary_classification.defvjp(_bc_fwd, _bc_bwd)


def binary_correct_count(y, target_classes, pattypes):
    """Count of correct classifications at threshold 0.5 (BinaryClassificationLayer.cu:69-85)."""
    valid = pattypes != 0
    tgt = target_classes.astype(jnp.float32) > 0.5
    est = y[..., 0] > 0.5
    return jnp.sum(jnp.where(valid, (tgt == est).astype(jnp.int32), 0))


# --------------------------------------------------------------------------
# multiclass_classification: sparse labels, paired with softmax.
# E = -sum(log(max(p[target], REAL_MIN))); grad: zeros except
# err[target] = -1/max(p[target], REAL_MIN)
# (MulticlassClassificationLayer.cu:195-240). Dummy slots have target -1.
# --------------------------------------------------------------------------

@jax.custom_vjp
def multiclass_classification(y, target_classes, pattypes):
    valid = target_classes >= 0
    idx = jnp.maximum(target_classes, 0)
    p = jnp.take_along_axis(y, idx[..., None], axis=-1)[..., 0]
    p = jnp.maximum(p, REAL_MIN)
    return -jnp.sum(jnp.where(valid, jnp.log(p), 0.0))


def _mc_fwd(y, target_classes, pattypes):
    return multiclass_classification(y, target_classes, pattypes), (y, target_classes)


def _mc_bwd(res, g):
    y, target_classes = res
    valid = target_classes >= 0
    idx = jnp.maximum(target_classes, 0)
    p = jnp.take_along_axis(y, idx[..., None], axis=-1)[..., 0]
    p = jnp.maximum(p, REAL_MIN)
    val = jnp.where(valid, -1.0 / p, 0.0) * g
    onehot = jax.nn.one_hot(idx, y.shape[-1], dtype=y.dtype)
    return (onehot * val[..., None], None, None)


multiclass_classification.defvjp(_mc_fwd, _mc_bwd)


def multiclass_correct_count(y, target_classes, pattypes):
    """Argmax accuracy counter (MulticlassClassificationLayer.cu:71-106).

    Reference scans for the max with `out > maxProb` starting at maxProb=0,
    estClass=0 — ties resolve to the FIRST argmax, same as jnp.argmax.
    """
    valid = target_classes >= 0
    est = jnp.argmax(y, axis=-1)
    return jnp.sum(jnp.where(valid, (est == target_classes).astype(jnp.int32), 0))


# name -> (fn, kind) where kind is "regression" (real targets) or
# "classification" (int targets)
LOSSES = {
    "sse": (sse, "regression"),
    "weighted_sse": (weighted_sse, "regression"),
    "weightedsse": (weighted_sse, "regression"),
    "rmse": (rmse, "regression"),
    "ce": (ce, "regression"),
    "sse_mask": (sse_mask, "regression"),
    "wf": (sse_mask, "regression"),
    "binary_classification": (binary_classification, "classification"),
    "multiclass_classification": (multiclass_classification, "classification"),
}
