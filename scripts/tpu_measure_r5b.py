"""Round-5 follow-up device session: CORRECTED streaming measurement.

The first r5 session's bench_streaming timed REPEATED INDEPENDENT calls
(same jitted fn, same buffers, no data flow between reps). Three of its
four numbers came out far above the chip's bf16 roofline — the repeated
dispatches were not honestly serialized compute (the dispatch-chained
number, 7.6M frames/s, was the only physically plausible one). This
session re-measures with every rep CHAINED through real data
dependencies, the same discipline bench.py uses (fori_loop chain, one
scalar sync at the end):

  - whole_seq: reps chained by adding mean(y) * 1e-24 to the input (an
    ulp-sized, data-dependent perturbation XLA cannot fold away, so no
    loop-invariant hoisting; numerics unchanged).
  - stream_fused / stream_scan: the LSTM stream state carries across
    reps inside one fori_loop — exactly continuous serving semantics.
  - stream_dispatch: unchanged methodology (state already chained), the
    online one-jitted-call-per-chunk regime.

Usage: nohup python scripts/tpu_measure_r5b.py > /root/repo/tpu_r5b.log 2>&1 &
Never run a second TPU process while this one lives.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(json.dumps({"stage": name, "ok": True, "dt": round(
            time.time() - t0, 1), **(out or {})}), flush=True)
    except Exception as e:  # noqa: BLE001 — keep later stages alive
        print(json.dumps({"stage": name, "ok": False, "dt": round(
            time.time() - t0, 1),
            "error": f"{type(e).__name__}: {e}"[:600]}), flush=True)


def bench_streaming():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lstm_rnn_tpu.models.flagship import timit_dblstm_layers
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

    # env overrides let the CPU smoke test run tiny shapes
    t = int(os.environ.get("R5B_T", "512"))
    b = int(os.environ.get("R5B_B", "64"))
    chunk = int(os.environ.get("R5B_CHUNK", "64"))
    layers = timit_dblstm_layers()
    for l in layers:
        if l["type"] == "blstm":
            l["type"] = "lstm"  # streaming needs unidirectional
    net = Network(layers, backend=os.environ.get("R5B_BACKEND", "pallas"))
    net.init_params(3)
    net.compute_dtype = jnp.dtype("bfloat16")
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(t, b, 117).astype(np.float32))
    pt = jnp.asarray(pattypes_from_lengths([t] * b, t, b))
    out = {"chunk": chunk, "t": t, "b": b}

    # -- whole-sequence inference, reps chained through the input --------
    # Discipline (third attempt, each prior artifact diagnosed):
    #  * n is a DEVICE scalar — a static trip count compiled a DIFFERENT
    #    program for warmup vs timed call, putting a full XLA compile
    #    inside the timed region (128k fps artifact);
    #  * sync by SCALAR VALUE FETCH (float(...)), never
    #    block_until_ready — on this tunnel runtime readiness does not
    #    wait for remote compute, which produced 925M/1.46B "fps"
    #    (bench.py's float(err) and the CLAUDE.md sync note exist for
    #    exactly this reason).
    reps = 20

    def whole_chain(params, x, pt, n):
        def body(i, carry):
            x, acc = carry
            y = net.apply(params, x, pt)
            s = jnp.mean(y).astype(x.dtype)
            return (x + s * 1e-24, acc + s.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

    whole_j = jax.jit(whole_chain)
    float(whole_j(params, x, pt, jnp.int32(2)))  # compile + full sync
    t0 = time.perf_counter()
    float(whole_j(params, x, pt, jnp.int32(reps)))
    out["whole_seq_fps"] = round(t * b * reps / (time.perf_counter() - t0), 1)

    # -- chunked fused streaming: state carries across chunks AND reps ---
    nch = t // chunk
    xs = x.reshape(nch, chunk, b, 117)
    pts = pt.reshape(nch, chunk, b)

    def stream_chain(params, xs, pts, n):
        def rep(r, carry):
            state, acc = carry

            def step(state, inp):
                xc, pc = inp
                y, state = net.apply_streaming(params, xc, pc, state)
                return state, jnp.mean(y).astype(jnp.float32)

            state, ms = jax.lax.scan(step, state, (xs, pts))
            return (state, acc + jnp.sum(ms))
        state0 = net.init_stream_state(b)
        return jax.lax.fori_loop(0, n, rep, (state0, jnp.float32(0)))[1]

    stream_j = jax.jit(stream_chain)
    float(stream_j(params, xs, pts, jnp.int32(2)))
    t0 = time.perf_counter()
    float(stream_j(params, xs, pts, jnp.int32(reps)))
    out["stream_fused_fps"] = round(
        t * b * reps / (time.perf_counter() - t0), 1)

    # -- per-dispatch streaming (online latency regime) -------------------
    # one jitted call per chunk, state threaded on the host; the final
    # scalar fetch (inside the timed region) forces the whole chain —
    # every chunk's compute is a data dependency of the last state
    def _sync(tree):  # scalar value fetch over every leaf: true barrier
        return float(jax.tree_util.tree_reduce(
            lambda a, leaf: a + jnp.sum(leaf.astype(jnp.float32)),
            tree, jnp.float32(0)))

    step_j = jax.jit(net.apply_streaming)
    st = net.init_stream_state(b)
    y0, st = step_j(params, xs[0], pts[0], st)
    _sync(st)  # compile + full sync
    dreps = 5
    t0 = time.perf_counter()
    last = None
    for _ in range(dreps):
        st2 = net.init_stream_state(b)
        for k in range(nch):
            yk, st2 = step_j(params, xs[k], pts[k], st2)
            last = st2
    _sync(last)
    dt = time.perf_counter() - t0
    out["stream_dispatch_fps"] = round(t * b * dreps / dt, 1)
    out["dispatch_latency_ms"] = round(dt / (dreps * nch) * 1000, 2)

    # -- scan-cell streaming for contrast (chained identically) ----------
    net.backend = "scan"
    scan_j = jax.jit(stream_chain)
    float(scan_j(params, xs, pts, jnp.int32(1)))
    t0 = time.perf_counter()
    float(scan_j(params, xs, pts, jnp.int32(5)))
    out["stream_scan_fps"] = round(t * b * 5 / (time.perf_counter() - t0), 1)
    return out


def main():
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    print(f"[measure] devices: {jax.devices()}", flush=True)
    stage("bench_streaming_chained", bench_streaming)
    print("[measure] DONE", flush=True)


if __name__ == "__main__":
    main()
