"""Network-level float64 oracle: full forward/backward/SGD over layer stacks.

Chains the per-layer oracle math (tests/oracle.py) exactly the way
NeuralNetwork.cpp orchestrates layers: forward in order, backward in reverse
order, gradients summed over the fraction's patterns, momentum SGD with
updates per fraction (stochastic) or per epoch (batch).
"""

from __future__ import annotations

import numpy as np

from . import oracle


FF_ACTS = {
    "feedforward_tanh": "tanh",
    "feedforward_logistic": "logistic",
    "feedforward_identity": "identity",
}


def net_forward(specs, params, x, pattypes):
    """Returns (output activations, per-layer input/output cache)."""
    cache = []
    h = x
    for s in specs[1:-1]:
        p = params[s.name]
        if s.type in ("lstm", "blstm"):
            y = oracle.lstm(p, h, pattypes, s.bias, s.type == "blstm")
        elif s.type == "softmax":
            y = oracle.softmax(p, h, s.bias)
        else:
            y = oracle.feedforward(p, h, FF_ACTS[s.type], s.bias)
        cache.append((s, h, y))
        h = y
    return h, cache


def net_backward(specs, params, cache, err):
    """err = dE/d(output activations). Returns grads dict per layer."""
    grads = {}
    for s, x_in, y in reversed(cache):
        p = params[s.name]
        if s.type in ("lstm", "blstm"):
            err, g = oracle.lstm_backward(p, x_in, _pt_of(cache), s.bias,
                                          s.type == "blstm", err)
        elif s.type == "softmax":
            err, g = oracle.softmax_backward(p, x_in, y, err, s.bias)
        else:
            err, g = oracle.feedforward_backward(p, x_in, y, err, FF_ACTS[s.type], s.bias)
        grads[s.name] = g
    return grads


_current_pt = None


def _pt_of(cache):
    return _current_pt


def sse_loss_and_err(y, targets, pt):
    """SsePostOutputLayer.cu: E = 0.5*sum((t-y)^2), grad = y - t, masked."""
    m = (pt != 0).astype(np.float64)[..., None]
    d = (targets - y) * m
    return 0.5 * float((d * d).sum()), (y - targets) * m


def train_epoch(specs, params, fractions, lr, momentum, layer_lr=None,
                velocity=None, stochastic=True, loss="multiclass",
                noise=None):
    """One oracle epoch; returns (params, velocity, total_error, correct).

    noise: optional list, one per-layer tree per fraction, added to the
    weights BEFORE the forward/backward and discarded before the update —
    the reference's inject->compute->restore weight-noise semantics
    (Optimizer.cu:58-84 injects into the weight buffer, TrainableLayer.cu:
    188-209 restores it): gradients are taken at the noisy point, the
    update applies to the CLEAN weights."""
    global _current_pt
    params = {k: {kk: np.array(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    if velocity is None:
        velocity = {k: {kk: np.zeros_like(vv) for kk, vv in v.items()}
                    for k, v in params.items()}
    grad_acc = None
    total_err = 0.0
    correct = 0

    def update(grads):
        for name, g in grads.items():
            l = layer_lr.get(name, lr) if layer_lr else lr
            for kk in g:
                velocity[name][kk] = momentum * velocity[name][kk] - l * g[kk]
                params[name][kk] = params[name][kk] + velocity[name][kk]

    for i, (x, targets, pt) in enumerate(fractions):
        _current_pt = pt
        if noise is not None:
            at = {k: {kk: params[k][kk] + np.asarray(noise[i][k][kk],
                                                     np.float64)
                      for kk in params[k]} for k in params}
        else:
            at = params
        y, cache = net_forward(specs, at, np.asarray(x, np.float64), pt)
        if loss == "multiclass":
            err_val, dy = oracle.multiclass_loss_and_err(y, targets, pt)
            valid = targets >= 0
            est = y.argmax(-1)
            correct += int(((est == targets) & valid).sum())
        else:
            err_val, dy = sse_loss_and_err(y, np.asarray(targets, np.float64), pt)
        total_err += err_val
        grads = net_backward(specs, at, cache, dy)
        if stochastic:
            update(grads)
        else:
            if grad_acc is None:
                grad_acc = grads
            else:
                for n in grads:
                    for kk in grads[n]:
                        grad_acc[n][kk] = grad_acc[n][kk] + grads[n][kk]
    if not stochastic:
        update(grad_acc)
    return params, velocity, total_err, correct
