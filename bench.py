"""Benchmark: TIMIT DBLSTM training throughput (frames/sec) on one chip.

The flagship recipe (BASELINE.md): 117-dim input -> 5 x BLSTM(250) ->
softmax(183) -> multiclass CE, parallel_sequences 50, truncate_seq 500.
The reference publishes no absolute numbers (BASELINE.md documents this), so
`vs_baseline` reports against a recorded CURRENNT-GPU estimate baseline of
BASELINE_FPS frames/sec; the north star is >= 10x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Estimated CURRENNT frames/sec for the TIMIT recipe on a period GPU.
# The repo ships no numbers (BASELINE.json: published={}). This constant is
# now ANCHORED by a real measurement: tools/currennt_cpu_proxy.cpp
# reproduces the reference's serial CPU execution structure and measures
# ~110 frames/sec on this host (BASELINE.md), making 10k a generous ~90x
# GPU-vs-serial-CPU allowance for period hardware.
BASELINE_FPS = 10_000.0


def main():
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.models.flagship import build_timit_network
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

    t, b = 500, 50  # truncate_seq x parallel_sequences from the recipe
    states = 183
    net = build_timit_network(seed=3)
    # production mode: fused Pallas scan, padded parameter view, bf16 MXU
    # matmuls (f32 accumulation and state). Loss trajectory matches
    # honest-f32 to ~4e-5 relative; float32 parity mode stays the default.
    net.backend = "pallas"
    net.compute_dtype = jnp.dtype("bfloat16")
    rng = np.random.RandomState(0)
    from lstm_rnn_tpu.trainer import Trainer
    x0 = rng.randn(t, b, 117).astype(np.float32)
    pt0 = pattypes_from_lengths([t] * b, t, b)
    tc0 = rng.randint(0, states, (t, b)).astype(np.int32)
    # bf16 streams need 16 batch rows per tile (Trainer._b_multiple)
    x0, tc0, pt0 = Trainer._pad_fraction(x0, tc0, pt0, b_multiple=16)
    # the Trainer casts inputs bf16 on the HOST (halved transfer, and the
    # device-resident fraction cache stores bf16) — mirror that here so the
    # step never runs an on-device f32->bf16 conversion pass
    import ml_dtypes
    x0 = x0.astype(ml_dtypes.bfloat16)
    x, tc, pt = jnp.asarray(x0), jnp.asarray(tc0), jnp.asarray(pt0)

    params = jax.tree_util.tree_map(jnp.asarray, net.pad_params(net.params))
    velocity = jax.tree_util.tree_map(jnp.zeros_like, params)
    lr, momentum = 1e-4, 0.9

    def train_step(params, velocity, x, tc, pt):
        # the Trainer's production path: fused Pallas softmax+CE tail
        def loss(p):
            err, cnt = net.loss_and_count_fused(p, x, tc, pt, padded=True)
            return err, cnt

        (err, _cnt), grads = jax.value_and_grad(loss, has_aux=True)(params)
        velocity = jax.tree_util.tree_map(lambda v, g: momentum * v - lr * g,
                                          velocity, grads)
        params = jax.tree_util.tree_map(lambda p, v: p + v, params, velocity)
        return params, velocity, err

    # the Trainer's production dispatch shape (train_scan / the stacked
    # epoch-resident corpus): N sequential SGD steps inside ONE jitted
    # fori_loop — a whole epoch is a single dispatch, so per-step
    # remote-tunnel latency is off the measured path, exactly as in the
    # steady-state CLI regime
    def chain(params, velocity, x, tc, pt, n):
        def body(_i, carry):
            params, velocity, e = carry
            params, velocity, err = train_step(params, velocity, x, tc, pt)
            return params, velocity, e + err

        return jax.lax.fori_loop(
            0, n, body, (params, velocity, jnp.zeros((), jnp.float32)))

    step = jax.jit(chain, donate_argnums=(0, 1))

    # ~1.2 s of device time per timed dispatch: the tunnel's fixed
    # dispatch + final-sync latency (~40 ms) amortizes below 3% (a 50-step
    # chain pays ~17% — measured; the CLI's pipelined epochs hide the same
    # cost by overlapping epochs)
    iters = 300
    n = jnp.asarray(iters, jnp.int32)
    # warmup / compile (short chain: same program, n is a device scalar)
    params, velocity, err = step(params, velocity, x, tc, pt,
                                 jnp.asarray(2, jnp.int32))
    float(err)

    t0 = time.perf_counter()
    params, velocity, err = step(params, velocity, x, tc, pt, n)
    float(err)
    dt = time.perf_counter() - t0

    frames = t * b * iters
    fps = frames / dt
    print(json.dumps({
        "metric": "timit_dblstm_train_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
