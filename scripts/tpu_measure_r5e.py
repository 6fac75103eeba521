"""Fourth round-5 device session — confirmations against the newly
shipped defaults (single TPU client, run detached):
  1. streaming_ct50: the chained streaming bench at --stream_chunk 50 —
     a NON-16-multiple chunk, so every dispatch runs the carry_t=50
     variant program the round-5 carry_t fix probes separately (ct50
     keys, validated this session). End-to-end proof + rate.
  2. bench_lvcsr_wide: the wide tail routed from SHIPPED verdicts (the
     Sp=10240 proj False-ladder + tailwide point now in defaults — no
     first-use probes should print).
  3. bench_f32: honest-f32 flagship — its proj-tail rows now resolve
     from the device verdict (r512; r1024 overflows in f32 only).

Usage: nohup python scripts/tpu_measure_r5e.py > /root/repo/tpu_r5e.log 2>&1 &
Never run a second TPU process while this one lives.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_measure_r5b import bench_streaming, stage  # noqa: E402


def streaming_ct50():
    os.environ["R5B_T"] = "500"
    os.environ["R5B_CHUNK"] = "50"
    try:
        return bench_streaming()
    finally:
        os.environ.pop("R5B_T", None)
        os.environ.pop("R5B_CHUNK", None)


def bench_lvcsr_wide():
    import bench
    fps = bench.run_bench(iters=60, states=10112)
    return {"frames_per_sec": round(fps, 1), "wide": True}


def bench_f32():
    import bench
    fps = bench.run_bench(iters=60, compute_dtype="float32")
    return {"frames_per_sec": round(fps, 1)}


def main():
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    print(f"[r5e] devices: {jax.devices()}", flush=True)
    stage("streaming_ct50", streaming_ct50)
    stage("bench_lvcsr_wide", bench_lvcsr_wide)
    stage("bench_f32", bench_f32)
    print("[r5e] DONE", flush=True)


if __name__ == "__main__":
    main()
