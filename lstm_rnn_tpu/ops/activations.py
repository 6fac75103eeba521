"""Activation functions with CURRENNT-exact numerics.

The reference toolkit defines its activations in
`currennt_lib/src/activation_functions/*.cuh` and numeric clamps in
`currennt_lib/src/helpers/{safeExp,boundRange,limitedError,NumericLimits}.cuh`.
Two quirks matter for numerical parity:

- `Tanh` is NOT the libm tanh: it is `Maxmin1(2x)` = `2*logistic(2x) - 1`
  (`activation_functions/Tanh.cuh`, `Maxmin1.cuh`). In exact arithmetic these
  are equal, but in float32 the logistic formulation saturates/rounds
  differently, so we reproduce it literally.
- `safeExp` clamps: x <= -1e30 -> 0, x >= 88.722839 -> FLT_MAX, else exp(x)
  (`helpers/safeExp.cuh`, `NumericLimits.cuh`).

`grad_clip` implements the reference's `limitedError` (gradient clamp to
[-1, 1], `helpers/limitedError.cuh`): identity in the forward pass, clamp in
the backward pass. Wrapping each LSTM gate preactivation with it makes jax
autodiff reproduce the hand-written BPTT of `layers/LstmLayer.cu:281-284`
exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Float32 numeric limits used by the reference (NumericLimits.cuh).
REAL_MIN = 1.1754944e-38
REAL_MAX = 3.4028235e38
EXP_LIMIT = 88.722839
LOG_ZERO = -1e30


def logistic(x):
    """Reference Logistic.cuh: 1/(1+exp(-x)) with hard saturation at +-expLimit."""
    # jax.nn.sigmoid saturates to exactly 0/1 at these magnitudes in float32
    # anyway; the explicit where matches the reference branch structure and
    # keeps float64 oracle comparisons honest.
    y = jax.nn.sigmoid(x)
    y = jnp.where(x >= EXP_LIMIT, jnp.ones_like(y), y)
    y = jnp.where(x <= -EXP_LIMIT, jnp.zeros_like(y), y)
    return y


def tanh2(x):
    """Reference Tanh.cuh: 2*logistic(2x) - 1 (NOT libm tanh)."""
    return 2.0 * logistic(2.0 * x) - 1.0


def identity(x):
    return x


def maxmin1(x):
    """Maxmin1.cuh: 2*logistic(x) - 1, range (-1, 1). (tanh2 = maxmin1(2x).)"""
    return 2.0 * logistic(x) - 1.0


def maxmin2(x):
    """Maxmin2.cuh: 4*logistic(x) - 2, range (-2, 2). Present in the
    reference's activation library but not reachable from any layer type
    (no LayerFactory entry); provided for inventory completeness."""
    return 4.0 * logistic(x) - 2.0


def max2min0(x):
    """Max2min0.cuh: 2*logistic(x), range (0, 2). Like maxmin2, unused by
    any reference layer type."""
    return 2.0 * logistic(x)


def safe_exp(x):
    """Reference safeExp.cuh: clamped exp."""
    e = jnp.exp(jnp.clip(x, LOG_ZERO, EXP_LIMIT))
    e = jnp.where(x >= EXP_LIMIT, jnp.full_like(x, REAL_MAX), e)
    e = jnp.where(x <= LOG_ZERO, jnp.zeros_like(x), e)
    return e


@jax.custom_vjp
def grad_clip(x):
    """Identity forward; clamps the cotangent to [-1, 1] on the way back.

    Mirrors helpers/limitedError.cuh applied to the LSTM gate deltas in
    LstmLayer.cu:281-284.
    """
    return x


def _grad_clip_fwd(x):
    return x, None


def _grad_clip_bwd(_, g):
    return (jnp.clip(g, -1.0, 1.0),)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


ACTIVATIONS = {
    "tanh": tanh2,
    "logistic": logistic,
    "identity": identity,
    "maxmin1": maxmin1,
    "maxmin2": maxmin2,
    "max2min0": max2min0,
}
