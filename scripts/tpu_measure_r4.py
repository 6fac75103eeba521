"""Round-4 on-device measurement session (single TPU client, run detached).

Stages (each prints one labeled JSON line; failures don't kill later
stages):
  1. wide-tail VMEM probes at the LVCSR flagship's real padded fan-in
     (derived from the pad plan — P=256 for 5xBLSTM(250); bf16 + f32)
  2. TIMIT flagship training bench (bench.run_bench, 300 iters)
  3. LVCSR training bench at Sp~10k: wide fused tail vs the
     materialized-logits fallback (LSTM_RNN_TPU_DISABLE_WIDE_TAIL)
  4. the same training chain through a 1-device DP mesh (NamedSharding'd
     operands + fused kernels inside the sharded program, on device)
  5. streaming inference: chunked carry-kernel serving vs whole-sequence

Usage: nohup python scripts/tpu_measure_r4.py > /root/repo/tpu_r4.log 2>&1 &
Never run a second TPU process while this one lives.
"""

from __future__ import annotations

import json
import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wait_for_relay():
    if os.environ.get("AXON_LOOPBACK_RELAY"):
        # loopback-relay plugin scheme: the classic pool-svc port is not in
        # play — the port probe below reports "down" on a healthy tunnel
        print("[measure] loopback relay scheme; skipping port wait",
              flush=True)
        return
    host = os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1").split(",")[0]
    port = int(os.environ.get("LSTM_RNN_TPU_AXON_PORT", "10000"))
    n = 0
    while True:
        try:
            with socket.create_connection((host, port), timeout=3):
                print(f"[measure] relay up after {n} checks", flush=True)
                return
        except OSError:
            n += 1
            if n % 10 == 1:
                print(f"[measure] relay {host}:{port} down, waiting "
                      f"(check {n})", flush=True)
            time.sleep(60)


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(json.dumps({"stage": name, "ok": True, "dt": round(
            time.time() - t0, 1), **(out or {})}), flush=True)
    except Exception as e:  # noqa: BLE001 — keep later stages alive
        print(json.dumps({"stage": name, "ok": False, "dt": round(
            time.time() - t0, 1),
            "error": f"{type(e).__name__}: {e}"[:500]}), flush=True)


def probes():
    import jax.numpy as jnp

    from lstm_rnn_tpu.models.flagship import timit_dblstm_layers
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.ops.vmem_probe import (ensure_tail_validated,
                                             ensure_wide_validated)
    # the REAL padded softmax fan-in of the LVCSR flagship (BLSTM(250) ->
    # 125 cells/direction -> hp 128 -> 2*128 = 256), not a guessed width —
    # read from the pad PLAN (spec-only), not a fully initialized 10k-state
    # parameter tree built just to look at one shape
    net = Network(timit_dblstm_layers(num_states=10112))
    P = net._pad_plan()[-1][2]
    out = {"P": P}
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        got = ensure_wide_validated(P, dt)
        out[f"wide_P{P}_{name}"] = list(got) if got else None
        # the wide FORWARD is the plain row-blocked tail at Spw=10240
        out[f"tail_S10240_{name}"] = ensure_tail_validated(
            0, 10240, dt, proj=False)
    return out


def bench_timit():
    import bench
    fps = bench.run_bench(iters=300)
    return {"frames_per_sec": round(fps, 1)}


def bench_lvcsr(disable_wide):
    def run():
        import bench
        if disable_wide:
            os.environ["LSTM_RNN_TPU_DISABLE_WIDE_TAIL"] = "1"
        else:
            os.environ.pop("LSTM_RNN_TPU_DISABLE_WIDE_TAIL", None)
        try:
            fps = bench.run_bench(iters=60, states=10112)
        finally:
            os.environ.pop("LSTM_RNN_TPU_DISABLE_WIDE_TAIL", None)
        return {"frames_per_sec": round(fps, 1), "wide": not disable_wide}
    return run


def bench_dp1():
    """Run the flagship training chain through the DP mesh machinery on a
    1-device mesh of the REAL chip: operands arrive NamedSharding'd and the
    fused Pallas kernels execute inside the sharded jit program — the
    device-level counterpart of the interpret-mode DP tests (VERDICT r3
    weak #6: multi-chip Pallas behavior was interpret-proven only)."""
    import bench
    fps = bench.run_bench(iters=60, num_devices=1)
    return {"frames_per_sec": round(fps, 1), "mesh": "data=1"}


def bench_streaming():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lstm_rnn_tpu.models.flagship import timit_dblstm_layers
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

    t, b, chunk = 512, 64, 64
    layers = timit_dblstm_layers()
    for l in layers:
        if l["type"] == "blstm":
            l["type"] = "lstm"  # streaming needs unidirectional
    net = Network(layers, backend="pallas")
    net.init_params(3)
    net.compute_dtype = jnp.dtype("bfloat16")
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(t, b, 117).astype(np.float32))
    pt = jnp.asarray(pattypes_from_lengths([t] * b, t, b))

    # whole-sequence inference rate (the fused inference kernel)
    reps = 20
    apply_j = jax.jit(lambda p, x, pt: net.apply(p, x, pt))
    y = apply_j(params, x, pt); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        y = apply_j(params, x, pt)
    y.block_until_ready()
    whole_fps = t * b * reps / (time.perf_counter() - t0)

    # chunked streaming: all chunks chained inside ONE jitted scan (the
    # serving regime where state stays on device)
    nch = t // chunk
    xs = x.reshape(nch, chunk, b, 117)
    pts = pt.reshape(nch, chunk, b)

    def chunked(params, xs, pts):
        state = net.init_stream_state(b)

        def step(state, inp):
            xc, pc = inp
            y, state = net.apply_streaming(params, xc, pc, state)
            return state, y

        _, ys = jax.lax.scan(step, state, (xs, pts))
        return ys

    chunked_j = jax.jit(chunked)
    ys = chunked_j(params, xs, pts); ys.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        ys = chunked_j(params, xs, pts)
    ys.block_until_ready()
    stream_fps = t * b * reps / (time.perf_counter() - t0)

    # scan-cell streaming for contrast
    net.backend = "scan"
    scan_j = jax.jit(chunked)
    ys = scan_j(params, xs, pts); ys.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        ys = scan_j(params, xs, pts)
    ys.block_until_ready()
    scan_fps = t * b * 5 / (time.perf_counter() - t0)
    return {"whole_seq_fps": round(whole_fps, 1),
            "stream_fused_fps": round(stream_fps, 1),
            "stream_scan_fps": round(scan_fps, 1),
            "chunk": chunk}


def main():
    wait_for_relay()
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    print(f"[measure] devices: {jax.devices()}", flush=True)
    stage("probes_wide", probes)
    stage("bench_timit", bench_timit)
    stage("bench_lvcsr_wide", bench_lvcsr(False))
    stage("bench_lvcsr_fallback", bench_lvcsr(True))
    stage("bench_dp1_mesh", bench_dp1)
    stage("bench_streaming", bench_streaming)
    print("[measure] DONE", flush=True)


if __name__ == "__main__":
    main()
