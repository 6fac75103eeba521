"""Feedforward and softmax layers (TPU-native).

Reference: `currennt_lib/src/layers/FeedForwardLayer.cu` computes one GEMM
over all timesteps (`outputs = W^T . prevOutputs`, FeedForwardLayer.cu:144-153)
then adds `bias_multiplier * bias_weights` and applies the activation.  We do
the same with a single time-batched matmul that XLA tiles onto the MXU, with
the bias add + activation fused in.

`SoftmaxLayer` (SoftmaxLayer.cu) is a feedforward-identity layer followed by
a numerically quirky softmax: the exponent is centered by
`offset = 0.5 * (min + max)` per pattern (SoftmaxLayer.cu:45-78) — NOT by the
max — and exponentiation uses `safeExp`. We reproduce both quirks. Padding
(PATTYPE_NONE) slots are skipped by the reference; their outputs are never
consumed downstream (the post-output losses mask them), so we compute them
unconditionally and let XLA fuse the whole thing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lstm_rnn_tpu.ops.activations import ACTIVATIONS, safe_exp


def _precision(compute_dtype):
    """float32 mode means HONEST fp32 matmuls (TPU default would silently
    run bf16 passes); bfloat16 mode uses the MXU's native precision."""
    if jnp.dtype(compute_dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def feedforward_forward(params, x, activation: str, bias_mult: float,
                        compute_dtype=jnp.float32):
    """x: [T, B, P] -> [T, B, L].

    params: {"W": [P, L], "b": [L]}.
    `bias_mult` is the layer's JSON "bias" value (a multiplier, usually 1.0;
    the TIMIT subsample layers use 0.0). `compute_dtype=bfloat16` runs the
    matmul at the MXU's native precision (float32 accumulation).
    """
    act = ACTIVATIONS[activation]
    a = jnp.einsum("tbp,pl->tbl", x.astype(compute_dtype),
                   params["W"].astype(compute_dtype),
                   preferred_element_type=jnp.float32,
                   precision=_precision(compute_dtype))
    a = a + bias_mult * params["b"]
    return act(a)


def softmax_forward(params, x, bias_mult: float, compute_dtype=jnp.float32):
    """Feedforward-identity + CURRENNT softmax. x: [T, B, P] -> [T, B, L]."""
    a = feedforward_forward(params, x, "identity", bias_mult, compute_dtype)
    # offset = 0.5*(min+max) per pattern (SoftmaxLayer.cu:74); the
    # reference's max-search STARTS at FLT_MIN (a positive number,
    # SoftmaxLayer.cu:60), so its effective max is max(true_max, REAL_MIN) —
    # matters when every preactivation is <= 0. Softmax is analytically
    # invariant to the offset, and the reference backward pass
    # (SoftmaxLayer.cu:317-353) is the plain softmax Jacobian, so we stop
    # the gradient through the offset to match it exactly.
    from lstm_rnn_tpu.ops.activations import REAL_MIN
    offset = jax.lax.stop_gradient(
        0.5 * (jnp.min(a, axis=-1, keepdims=True)
               + jnp.maximum(jnp.max(a, axis=-1, keepdims=True), REAL_MIN))
    )
    e = safe_exp(a - offset)
    return e / jnp.sum(e, axis=-1, keepdims=True)
