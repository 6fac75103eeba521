"""Float64 NumPy oracle implementing the CURRENNT math.

This is the test-side re-statement of the reference semantics
(currennt_lib/src/layers/*.cu) in plain NumPy, used to validate the jax
framework the same way the reference's Cpu template path validated its Gpu
path. Forward AND the hand-written BPTT (including the gate-delta clipping
of limitedError) are implemented so gradient parity can be checked without
relying on jax autodiff itself.

Everything is [T, B, ...] time-major; pattypes [T, B] with 0 = NONE.
"""

from __future__ import annotations

import numpy as np

EXP_LIMIT = 88.722839
REAL_MIN = 1.1754944e-38


def logistic(x):
    y = 1.0 / (1.0 + np.exp(-np.clip(x, -500, 500)))
    y = np.where(x >= EXP_LIMIT, 1.0, y)
    y = np.where(x <= -EXP_LIMIT, 0.0, y)
    return y


def tanh2(x):
    return 2.0 * logistic(2.0 * x) - 1.0


def feedforward(params, x, act, bias_mult):
    a = x @ params["W"] + bias_mult * params["b"]
    if act == "tanh":
        return tanh2(a)
    if act == "logistic":
        return logistic(a)
    return a


def feedforward_backward(params, x, y, err, act, bias_mult):
    """Returns (prev_err, grads). err is dE/dy. (FeedForwardLayer.cu:173-224)"""
    if act == "tanh":
        deriv = (1.0 - y * y) / 1.0  # Tanh::deriv(y) = 1 - y^2
    elif act == "logistic":
        deriv = y * (1.0 - y)
    else:
        deriv = np.ones_like(y)
    delta = deriv * err
    prev_err = delta @ params["W"].T
    g_w = np.einsum("tbp,tbl->pl", x, delta)
    g_b = bias_mult * delta.sum(axis=(0, 1))
    return prev_err, {"W": g_w, "b": g_b}


def softmax(params, x, bias_mult):
    a = feedforward(params, x, "identity", bias_mult)
    # the reference's max-search starts at FLT_MIN (SoftmaxLayer.cu:60)
    mx = np.maximum(a.max(axis=-1, keepdims=True), 1.1754944e-38)
    off = 0.5 * (a.min(axis=-1, keepdims=True) + mx)
    e = np.exp(np.clip(a - off, -1e30, EXP_LIMIT))
    return e / e.sum(axis=-1, keepdims=True)


def softmax_backward(params, x, y, err, bias_mult):
    """delta = y * (err - sum(y*err)) then identity-FF backward."""
    off = (y * err).sum(axis=-1, keepdims=True)
    delta = y * (err - off)
    prev_err = delta @ params["W"].T
    g_w = np.einsum("tbp,tbl->pl", x, delta)
    g_b = bias_mult * delta.sum(axis=(0, 1))
    return prev_err, {"W": g_w, "b": g_b}


def _clip1(x):
    return np.clip(x, -1.0, 1.0)


def lstm_direction(x, w_in, w_rec, b, peep, mask, bias_mult, backward_dir):
    """One LSTM direction. x: [T,B,P]; w_in: (P,4,H); w_rec: (H,4,H);
    b: (4,H); peep: (3,H); mask: [T,B] float. Returns dict of all
    activations needed by the BPTT (LstmLayer.cu ComputeBlockOutputFn)."""
    T, B, _ = x.shape
    H = w_in.shape[-1]
    order = range(T - 1, -1, -1) if backward_dir else range(T)
    A = np.einsum("tbp,pgh->tbgh", x, w_in) + bias_mult * b  # [T,B,4,H]
    h = np.zeros((B, H))
    c = np.zeros((B, H))
    ni = np.zeros((T, B, H)); ig = np.zeros((T, B, H))
    fg = np.zeros((T, B, H)); og = np.zeros((T, B, H))
    cs = np.zeros((T, B, H)); hs = np.zeros((T, B, H))
    for t in order:
        a = A[t] + np.einsum("bh,hgj->bgj", h, w_rec)
        m = mask[t][:, None]
        nit = tanh2(a[:, 0])
        igt = logistic(a[:, 1] + c * peep[0])
        fgt = logistic(a[:, 2] + c * peep[1])
        ct = nit * igt + fgt * c
        ogt = logistic(a[:, 3] + ct * peep[2])
        ht = tanh2(ct) * ogt
        ht = ht * m
        ct = ct * m
        # store masked gate activations as zero (reference zeroes outputs/cell
        # state; gate act buffers keep stale values but they only feed masked
        # deltas, so zero is equivalent)
        ni[t], ig[t], fg[t], og[t] = nit * m, igt * m, fgt * m, ogt * m
        cs[t], hs[t] = ct, ht
        h, c = ht, ct
    return {"ni": ni, "ig": ig, "fg": fg, "og": og, "c": cs, "h": hs}


def lstm_direction_backward(x, w_in, w_rec, b, peep, mask, bias_mult,
                            backward_dir, fwd, err):
    """Hand-written BPTT per ComputeBlockErrorsFn (LstmLayer.cu:190-287) and
    weight updates per ComputeWeightUpdateFn (289-512). err: dE/dh [T,B,H].
    Returns (prev_err [T,B,P], grads dict)."""
    T, B, H = err.shape
    ni, ig, fg, og, cs = fwd["ni"], fwd["ig"], fwd["fg"], fwd["og"], fwd["c"]
    hs = fwd["h"]
    order = list(range(T - 1, -1, -1)) if not backward_dir else list(range(T))
    niD = np.zeros((T, B, H)); igD = np.zeros((T, B, H))
    fgD = np.zeros((T, B, H)); ogD = np.zeros((T, B, H))
    csE = np.zeros((T, B, H))
    # reverse scan order: the recurrent error contribution
    # err[t_prev] += sum_g W_rec[:,g,:] . gateDelta[t] is accumulated into the
    # running error buffer BEFORE t_prev is processed (LstmLayer.cu:936-951).
    cur_err = np.array(err, copy=True)
    for i, t in enumerate(order):
        is_first_rev = i == 0
        is_last_rev = i == len(order) - 1
        m = mask[t][:, None]
        e = cur_err[t]
        tanh_c = tanh2(cs[t])
        ogDelta = og[t] * (1 - og[t]) * tanh_c * e
        csErr = og[t] * (1 - tanh_c * tanh_c) * e + peep[2] * ogDelta
        if not is_first_rev:
            tn = order[i - 1]
            csErr = csErr + fg[tn] * csE[tn] + peep[0] * igD[tn] + peep[1] * fgD[tn]
        niDelta = ig[t] * (1 - ni[t] * ni[t]) * csErr
        if not is_last_rev:
            tp = order[i + 1]
            fgDelta = fg[t] * (1 - fg[t]) * cs[tp] * csErr
        else:
            fgDelta = np.zeros_like(csErr)
        igDelta = ig[t] * (1 - ig[t]) * ni[t] * csErr
        niD[t] = _clip1(niDelta) * m
        igD[t] = _clip1(igDelta) * m
        fgD[t] = _clip1(fgDelta) * m
        ogD[t] = _clip1(ogDelta) * m
        csE[t] = csErr * m
        if not is_last_rev:
            tp = order[i + 1]
            for g, gd in enumerate((niD, igD, fgD, ogD)):
                cur_err[tp] += gd[t] @ w_rec[:, g, :].T
    # weight gradients
    grads = {}
    deltas = np.stack([niD, igD, fgD, ogD], axis=2)  # [T,B,4,H]
    grads["W_in"] = np.einsum("tbp,tbgh->pgh", x, deltas)
    # recurrent grads: delta[t] pairs with the SCAN-previous output
    # (t-1 for the fw direction, t+1 for bw) — in BPTT order that is always
    # order[i+1]; the scan's first step (order[-1]) has h_prev = 0 and is
    # skipped (skipFirst/LastPattern in ComputeWeightUpdateFn).
    g_rec = np.zeros_like(w_rec)
    for i, t in enumerate(order):
        if i == len(order) - 1:
            continue
        tp = order[i + 1]
        g_rec += np.einsum("bs,bgj->sgj", hs[tp], deltas[t])
    grads["W_rec"] = g_rec
    grads["b"] = bias_mult * deltas.sum(axis=(0, 1))
    # peephole grads: ig/fg use the scan-previous cell state, og uses c[t]
    g_peep = np.zeros_like(peep)
    for i, t in enumerate(order):
        if i < len(order) - 1:
            tp = order[i + 1]
            g_peep[0] += (cs[tp] * igD[t]).sum(axis=0)
            g_peep[1] += (cs[tp] * fgD[t]).sum(axis=0)
        g_peep[2] += (cs[t] * ogD[t]).sum(axis=0)
    grads["peep"] = g_peep
    # error to preceding layer: sum_g W_in[:,g,:] . gD
    prev_err = np.einsum("pgh,tbgh->tbp", w_in, deltas)
    return prev_err, grads


def lstm(params, x, pattypes, bias_mult, bidirectional):
    mask = (pattypes != 0).astype(np.float64)
    if not bidirectional:
        fwd = lstm_direction(x, params["W_in"][0], params["W_rec"][0],
                             params["b"][0], params["peep"][0], mask, bias_mult, False)
        return fwd["h"]
    f = lstm_direction(x, params["W_in"][0], params["W_rec"][0],
                       params["b"][0], params["peep"][0], mask, bias_mult, False)
    bkw = lstm_direction(x, params["W_in"][1], params["W_rec"][1],
                         params["b"][1], params["peep"][1], mask, bias_mult, True)
    return np.concatenate([f["h"], bkw["h"]], axis=-1)


def lstm_backward(params, x, pattypes, bias_mult, bidirectional, err):
    mask = (pattypes != 0).astype(np.float64)
    if not bidirectional:
        fwd = lstm_direction(x, params["W_in"][0], params["W_rec"][0],
                             params["b"][0], params["peep"][0], mask, bias_mult, False)
        pe, g = lstm_direction_backward(x, params["W_in"][0], params["W_rec"][0],
                                        params["b"][0], params["peep"][0], mask,
                                        bias_mult, False, fwd, err)
        grads = {k: v[None] for k, v in g.items()}
        return pe, grads
    H = params["W_in"].shape[-1]
    f = lstm_direction(x, params["W_in"][0], params["W_rec"][0],
                       params["b"][0], params["peep"][0], mask, bias_mult, False)
    bk = lstm_direction(x, params["W_in"][1], params["W_rec"][1],
                        params["b"][1], params["peep"][1], mask, bias_mult, True)
    pe_f, g_f = lstm_direction_backward(x, params["W_in"][0], params["W_rec"][0],
                                        params["b"][0], params["peep"][0], mask,
                                        bias_mult, False, f, err[..., :H])
    pe_b, g_b = lstm_direction_backward(x, params["W_in"][1], params["W_rec"][1],
                                        params["b"][1], params["peep"][1], mask,
                                        bias_mult, True, bk, err[..., H:])
    grads = {k: np.stack([g_f[k], g_b[k]]) for k in g_f}
    return pe_f + pe_b, grads


def multiclass_loss_and_err(y, target_classes, pattypes):
    """Returns (error_sum, dE/dy) per MulticlassClassificationLayer.cu."""
    T, B, L = y.shape
    err = np.zeros_like(y)
    total = 0.0
    for t in range(T):
        for bidx in range(B):
            tc = target_classes[t, bidx]
            if tc < 0:
                continue
            p = max(y[t, bidx, tc], REAL_MIN)
            total -= np.log(p)
            err[t, bidx, tc] = -1.0 / p
    return total, err
