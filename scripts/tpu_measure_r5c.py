"""Third round-5 device session:
  1. the CORRECTED chained streaming bench (scalar-value-fetch sync —
     block_until_ready does not wait for remote compute on this tunnel)
  2. tail-probe N-fidelity matrix: the chunk family's scoped-VMEM stack
     grew with its grid size (vmem_probe k3); check whether the fused
     softmax+CE tail kernels share the failure class by compiling the
     same (Sp, rows) points at 2 vs 64 grid steps. If verdicts flip, the
     tail keys need the same grid-count treatment; if not, the shape-only
     t1 keys stand.

Usage: nohup python scripts/tpu_measure_r5c.py > /root/repo/tpu_r5c.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_measure_r5b import bench_streaming, stage  # noqa: E402


def tail_n_fidelity():
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import softmax_ce as sc

    out = []
    for proj, P, Sp, rows in [
        (False, 0, 1536, 1024),    # plain tail, clawed-back row block
        (False, 0, 10240, 256),    # plain tail at the LVCSR padded width
        (True, 512, 256, 2048),    # proj tail, flagship point
        (True, 512, 256, 1024),
    ]:
        for gsteps in (2, 64):
            N = gsteps * rows
            tc = jax.ShapeDtypeStruct((N, 1), jnp.int32)
            old = sc._rows_override
            sc._rows_override = rows
            t0 = time.time()
            try:
                if proj:
                    def loss(h, W, b, tc):
                        return sc.softmax_ce_proj_fused(
                            h, W, b, tc, Sp - 1, 1.0, False,
                            jnp.dtype(jnp.bfloat16))[0]
                    g = jax.grad(loss, argnums=(0, 1, 2))
                    shapes = (jax.ShapeDtypeStruct((N, P), jnp.float32),
                              jax.ShapeDtypeStruct((P, Sp), jnp.float32),
                              jax.ShapeDtypeStruct((Sp,), jnp.float32), tc)
                else:
                    def loss(a, tc):
                        return sc.softmax_ce_fused(a, tc, Sp - 1, False,
                                                   jnp.float32)[0]
                    g = jax.grad(loss)
                    shapes = (jax.ShapeDtypeStruct((N, Sp), jnp.float32), tc)
                try:
                    jax.jit(g).lower(*shapes).compile()
                    ok = True
                except Exception as e:  # noqa: BLE001
                    low = str(e).lower()
                    ok = (False if ("exceed" in low and
                                    ("scoped" in low or "vmem" in low))
                          else None)
            finally:
                sc._rows_override = old
            out.append({"proj": proj, "P": P, "Sp": Sp, "rows": rows,
                        "gsteps": gsteps, "compiles": ok,
                        "dt": round(time.time() - t0, 1)})
            print(json.dumps(out[-1]), flush=True)
    flips = [(a["proj"], a["Sp"], a["rows"]) for a, b in zip(out[::2],
                                                            out[1::2])
             if a["compiles"] != b["compiles"]]
    return {"flips": flips, "n_points": len(out) // 2}


def main():
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    print(f"[r5c] devices: {jax.devices()}", flush=True)
    stage("bench_streaming_chained", bench_streaming)
    stage("tail_n_fidelity", tail_n_fidelity)
    print("[r5c] DONE", flush=True)


if __name__ == "__main__":
    main()
