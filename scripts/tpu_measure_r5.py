"""Round-5 on-device measurement session (single TPU client, run detached).

Stages (each prints one labeled JSON line; failures don't kill later
stages):
  1. mask_probe: device-validate the MASKED carry-kernel forward (the
     streaming serving program) at the flagship serving points — the probe
     family VERDICT r4 asked for; round 4's only failed device stage was
     this program's mask-block layout
  2. bench_streaming: chunked carry-kernel serving vs whole-sequence
     inference (the r4 stage that died at compile, re-run against the
     lane-padded mask layout)
  3. bench_timit: flagship training bench (300-iter fori_loop chain)
  4. bench_lvcsr_wide / bench_lvcsr_fallback: the fork's LVCSR-scale
     softmax, wide fused tail vs materialized fallback (RESULTS.md rows)
  5. wide_profile: xplane device-time split of the wide LVCSR step
     (projection matmul vs Pallas tail passes vs LSTM kernels) — the
     roofline evidence VERDICT r5-#2 asks for
  6. bench_dp1_mesh: the training chain through a 1-device DP mesh
     (single-chip proof of the sharded program + fused kernels)

Usage: nohup python scripts/tpu_measure_r5.py > /root/repo/tpu_r5.log 2>&1 &
Never run a second TPU process while this one lives.

SUPERSEDED FOR TIMING: the bench_streaming stage (2) syncs with
block_until_ready, which on this tunnel returns BEFORE the device
finishes (CLAUDE.md "the ONLY honest sync is a scalar VALUE fetch") —
its throughput numbers are invalid (measured artifacts up to 37x over
v5e peak). The other stages are sound: 3/4/6 time through
bench.run_bench's scalar fetch and 1/5 record verdicts/profiles, not
rates. For streaming rates rerun scripts/tpu_measure_r5c.py
(bench_streaming_chained: reps chained through data dependencies,
synced by float(scalar)).
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
            "error": f"{type(e).__name__}: {e}"[:600]}), flush=True)


def mask_probe():
    """Device-validate the masked streaming forward at the serving points
    bench_streaming will hit: unidirectional 250-cell layers (hp=256),
    first-layer fan-in 117 (pp=128) then 250 (pp=256), b=64, 64-frame
    chunks — exactly what the CLI's --stream_chunk setup probes."""
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops.vmem_probe import ensure_mask_validated

    out = {}
    for name, (hp, pp) in (("l1_P128", (256, 128)),
                           ("l2to5_P256", (256, 256))):
        out[name] = ensure_mask_validated(64, hp, pp, 64, jnp.bfloat16)
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


def _xplane_op_split(logdir):
    """Sum per-op self-times from the trace's 'XLA Ops' line and bucket
    them: LSTM fwd/bwd kernels, fused tail kernels, XLA matmul fusions,
    everything else. Returns (buckets_ms, top_ops)."""
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    totals = {}
    for plane in xs.planes:
        if "/device:TPU" not in plane.name and "TPU" not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = ev_names.get(ev.metadata_id, "?")
                totals[nm] = totals.get(nm, 0) + ev.duration_ps
    buckets = {"lstm_fwd": 0, "lstm_bwd": 0, "tail": 0, "matmul_fusion": 0,
               "other": 0}
    for nm, ps in totals.items():
        low = nm.lower()
        if "bwd_kernel" in low or "bwd_dw" in low or "bwd_dx" in low:
            buckets["lstm_bwd"] += ps
        elif "fwd_kernel" in low:
            buckets["lstm_fwd"] += ps
        elif ("tail" in low or "softmax" in low or "wide" in low
              or "ce_" in low):
            buckets["tail"] += ps
        elif "dot" in low or "fusion" in low or "convert" in low:
            buckets["matmul_fusion"] += ps
        else:
            buckets["other"] += ps
    to_ms = lambda ps: round(ps / 1e9, 3)  # noqa: E731
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:14]
    return ({k: to_ms(v) for k, v in buckets.items()},
            [(nm[:64], to_ms(ps)) for nm, ps in top])


def wide_profile():
    """xplane profile of the wide LVCSR training step: what binds the
    2.25M frames/s — the XLA projection matmul, the Pallas tail passes,
    or the LSTM kernels (VERDICT r5 #2)."""
    import jax

    import bench

    logdir = "/root/repo/.profile_r5_wide"
    os.makedirs(logdir, exist_ok=True)
    steps = 30
    with jax.profiler.trace(logdir):
        fps = bench.run_bench(iters=steps, states=10112)
    buckets, top = _xplane_op_split(logdir)
    dev_ms = sum(buckets.values())
    return {"frames_per_sec": round(fps, 1), "steps": steps,
            "device_ms_total": round(dev_ms, 1),
            "device_ms_per_step": round(dev_ms / (steps + 2), 3),
            "buckets_ms": buckets, "top_ops": top}


def bench_dp1():
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

    # per-dispatch streaming (the online latency regime: one jitted step
    # per chunk arriving from the host, state stays on device)
    step_j = jax.jit(net.apply_streaming)
    st = net.init_stream_state(b)
    y0, st = step_j(params, xs[0], pts[0], st)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    outs = []
    for _ in range(5):
        st2 = net.init_stream_state(b)
        for k in range(nch):
            yk, st2 = step_j(params, xs[k], pts[k], st2)
            outs.append(yk)
    jax.block_until_ready(outs[-1])
    dispatch_fps = t * b * 5 / (time.perf_counter() - t0)

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
            "stream_dispatch_fps": round(dispatch_fps, 1),
            "stream_scan_fps": round(scan_fps, 1),
            "chunk": chunk}


def main():
    wait_for_relay()
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    print(f"[measure] devices: {jax.devices()}", flush=True)
    stage("mask_probe", mask_probe)
    stage("bench_streaming", bench_streaming)
    stage("bench_timit", bench_timit)
    stage("bench_lvcsr_wide", bench_lvcsr(False))
    stage("bench_lvcsr_fallback", bench_lvcsr(True))
    stage("wide_profile", wide_profile)
    stage("bench_dp1_mesh", bench_dp1)
    print("[measure] DONE", flush=True)


if __name__ == "__main__":
    main()
