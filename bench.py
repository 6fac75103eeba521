"""Benchmark: TIMIT DBLSTM training throughput (frames/sec) on one chip.

The flagship recipe (BASELINE.md): 117-dim input -> 5 x BLSTM(250) ->
softmax(183) -> multiclass CE, parallel_sequences 50, truncate_seq 500.
The reference publishes no absolute numbers (BASELINE.md documents this), so
`vs_baseline` reports against a recorded CURRENNT-GPU estimate baseline of
BASELINE_FPS frames/sec; the north star is >= 10x.

Always prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} —
on failure (relay down, backend init exhausted, device error) the line
carries an additional "error" field and value 0, so the driver records a
parseable result instead of timing out on the backend retry ladder
(BENCH_MAX_RETRIES bounds ensure_backend, default 1 ~ <=2 min of waiting;
the round-3 driver bench timed out at rc=124 because the unbounded ladder
slept ~36 min on a downed relay).

Flags: --num_devices N shards the fraction batch over an N-chip DP mesh
(parallel/mesh.py) — ready for multi-chip hardware (N=1 still builds the
mesh, proving the sharded program + fused kernels on one real chip);
--recipe lvcsr swaps the softmax for the fork's LVCSR-scale state count
(README.md:12).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# Estimated CURRENNT frames/sec for the TIMIT recipe on a period GPU.
# The repo ships no numbers (BASELINE.json: published={}). This constant is
# now ANCHORED by a real measurement: tools/currennt_cpu_proxy.cpp
# reproduces the reference's serial CPU execution structure and measures
# ~110 frames/sec on this host (BASELINE.md), making 10k a generous ~90x
# GPU-vs-serial-CPU allowance for period hardware.
BASELINE_FPS = 10_000.0

METRIC = "timit_dblstm_train_frames_per_sec"


def run_bench(t: int = 500, b: int = 50, iters: int = 300,
              num_devices: int = 0, net=None, states: int = 183,
              input_size: int = 117, compute_dtype: str = "bfloat16",
              backend: str = "pallas", warmup_iters: int = 2,
              interpret: bool = False) -> float:
    """Measure training frames/sec for `iters` chained SGD steps.

    Callable with tiny shapes + a tiny net from tests (the --num_devices DP
    path is verified on the virtual CPU mesh this way); main() runs the
    flagship shapes on the real chip.
    """
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths
    from lstm_rnn_tpu.trainer import Trainer

    if net is None:
        from lstm_rnn_tpu.models.flagship import build_timit_network
        net = build_timit_network(num_states=states, seed=3)
    # production mode: fused Pallas scan, padded parameter view, bf16 MXU
    # matmuls (f32 accumulation and state). Loss trajectory matches
    # honest-f32 to ~4e-5 relative; float32 parity mode stays the default.
    net.backend = backend
    net.compute_dtype = jnp.dtype(compute_dtype)
    rng = np.random.RandomState(0)
    x0 = rng.randn(t, b, input_size).astype(np.float32)
    pt0 = pattypes_from_lengths([t] * b, t, b)
    tc0 = rng.randint(0, states, (t, b)).astype(np.int32)
    # bf16 streams need 16 batch rows per tile (Trainer._b_multiple); a DP
    # mesh additionally needs B divisible by the data-axis size
    import math
    bmul = math.lcm(16, num_devices) if num_devices >= 1 else 16
    x0, tc0, pt0 = Trainer._pad_fraction(x0, tc0, pt0, b_multiple=bmul)
    # the Trainer casts inputs bf16 on the HOST (halved transfer, and the
    # device-resident fraction cache stores bf16) — mirror that here so the
    # step never runs an on-device f32->bf16 conversion pass
    if net.compute_dtype == jnp.bfloat16:
        import ml_dtypes
        x0 = x0.astype(ml_dtypes.bfloat16)

    params0 = net.pad_params(net.params)
    # num_devices >= 1 routes through the DP mesh machinery even on ONE
    # device: operands arrive NamedSharding'd and the fused Pallas kernels
    # execute inside the sharded jit program — on the real chip this is the
    # device-level proof of the DP program shape that the virtual-CPU tests
    # can only run interpreted (num_devices=0 keeps the plain single-device
    # path as the default bench configuration).
    if num_devices >= 1:
        from lstm_rnn_tpu.parallel.mesh import (make_mesh, replicate,
                                                shard_fraction)
        mesh = make_mesh(num_devices)
        x, tc, pt = shard_fraction(mesh, jnp.asarray(x0), jnp.asarray(tc0),
                                   jnp.asarray(pt0))
        params = replicate(mesh, params0)
    else:
        x, tc, pt = jnp.asarray(x0), jnp.asarray(tc0), jnp.asarray(pt0)
        params = jax.tree_util.tree_map(jnp.asarray, params0)
    velocity = jax.tree_util.tree_map(jnp.zeros_like, params)
    lr, momentum = 1e-4, 0.9

    def train_step(params, velocity, x, tc, pt):
        # the Trainer's production path: fused Pallas softmax+CE tail
        def loss(p):
            err, cnt = net.loss_and_count_fused(p, x, tc, pt, padded=True,
                                                interpret=interpret)
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
    n = jnp.asarray(iters, jnp.int32)
    # warmup / compile (short chain: same program, n is a device scalar)
    params, velocity, err = step(params, velocity, x, tc, pt,
                                 jnp.asarray(warmup_iters, jnp.int32))
    float(err)

    t0 = time.perf_counter()
    params, velocity, err = step(params, velocity, x, tc, pt, n)
    float(err)
    dt = time.perf_counter() - t0

    # frames = the RECIPE's t*b (padding rows are overhead, not throughput)
    return t * b * iters / dt


def _emit(fps: float, error: str | None = None,
          metric: str = METRIC) -> None:
    out = {
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    if error:
        out["error"] = error[:400]
    print(json.dumps(out), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_devices", type=int, default=0,
                    help="shard the fraction batch over an N-chip DP mesh")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--recipe", choices=("timit", "lvcsr"), default="timit",
                    help="lvcsr: the fork's wide-softmax target "
                         "(~10k physical HMM states)")
    args = ap.parse_args(argv)

    metric = METRIC if args.recipe == "timit" \
        else "lvcsr_dblstm_train_frames_per_sec"
    try:
        from lstm_rnn_tpu.utils.device import ensure_backend
        # bounded: the driver's window must get a parseable line even when
        # the axon relay is down (round-3 rc=124 postmortem, VERDICT #1b).
        # BENCH_MAX_RETRIES caps the retry ladder; the SIGALRM additionally
        # bounds the claim-wedge mode where the native plugin init hangs
        # INSIDE jax.devices() with the relay port still accepting.
        import signal
        # default sized ABOVE the measured cold-grant wall: after a
        # machine restart the loopback-relay plugin sat ~13 min in
        # native init (futex wait — SIGALRM cannot preempt native code;
        # an expired alarm fires the moment Python resumes, turning a
        # SUCCESSFUL late init into a spurious failure line), then
        # worked perfectly (tpu_bench_try.log, round 5)
        budget = int(os.environ.get("BENCH_MAX_WAIT", "900"))
        # the budget is an ABSOLUTE deadline carried across ensure_backend's
        # re-exec retries (execv preserves the environment): each retry arms
        # only the remaining time, so the total wall stays ~BENCH_MAX_WAIT
        # instead of multiplying by the retry count
        if "BENCH_DEADLINE" not in os.environ:
            os.environ["BENCH_DEADLINE"] = str(time.time() + budget)
        remaining = max(1, int(float(os.environ["BENCH_DEADLINE"])
                               - time.time()))

        def _alarm(_sig, _frm):
            raise TimeoutError(
                f"backend init exceeded BENCH_MAX_WAIT={budget}s "
                "(tunnel claim wedge?)")

        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(remaining)
        try:
            ensure_backend(
                max_retries=int(os.environ.get("BENCH_MAX_RETRIES", "1")))
        finally:
            signal.alarm(0)
        states = 183 if args.recipe == "timit" else 10112
        fps = run_bench(iters=args.iters, num_devices=args.num_devices,
                        states=states)
    except Exception as e:  # noqa: BLE001 — ANY failure must stay parseable
        _emit(0.0, error=f"{type(e).__name__}: {e}", metric=metric)
        return
    _emit(fps, metric=metric)


if __name__ == "__main__":
    main()
