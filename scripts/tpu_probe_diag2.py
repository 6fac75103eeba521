"""Second probe-fidelity sweep: the backward kernel's scoped-VMEM stack
grows with the time-chunk GRID SIZE (tpu_probe_diag.py: c16 fits at
NC=2, overflows at NC=47). Sweep NC to find where it crosses the 16M
limit and whether it saturates — this picks the minimal probe T that
reproduces the asymptotic footprint.

Usage: nohup python scripts/tpu_probe_diag2.py > /root/repo/tpu_probe_diag2.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def try_compile(hp, pp, bp, ch, T, dtype_name):
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import lstm_cell as lc
    cdt = jnp.dtype(jnp.bfloat16 if dtype_name == "bf16" else jnp.float32)
    D = 2

    def loss(x, w_in, w_rec, peep, bias, lengths, dh):
        h = lc.lstm_scan_fused(x, w_in, w_rec, peep, bias, lengths,
                               1.0, True, False, cdt, need_dx=False)
        return jnp.sum(h.astype(jnp.float32) * dh)

    g = jax.grad(loss, argnums=(1, 2, 3, 4))
    shapes = (
        jax.ShapeDtypeStruct((T, bp, pp), jnp.float32),
        jax.ShapeDtypeStruct((D, pp, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((D, hp, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((D, 3, hp), jnp.float32),
        jax.ShapeDtypeStruct((D, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((bp,), jnp.int32),
        jax.ShapeDtypeStruct((T, bp, D * hp), jnp.float32),
    )
    old = lc._chunk_override
    lc._chunk_override = ch
    t0 = time.time()
    try:
        jax.jit(g).lower(*shapes).compile()
        ok, size = True, ""
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        low = msg.lower()
        if "exceed" in low and ("scoped" in low or "vmem" in low):
            ok = False
            import re
            m = re.search(r"size ([0-9.]+[KM]) and limit", msg)
            size = m.group(1) if m else ""
        else:
            ok, size = None, f"{type(e).__name__}: {msg[:160]}"
    finally:
        lc._chunk_override = old
    return ok, size, round(time.time() - t0, 1)


def main():
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    print(f"[diag2] devices: {jax.devices()}", flush=True)
    cases = [
        # f32 c16 at (128,128,56): NC sweep
        (128, 128, 56, 16, 48, "f32"),    # NC=3
        (128, 128, 56, 16, 64, "f32"),    # NC=4
        (128, 128, 56, 16, 112, "f32"),   # NC=7
        (128, 128, 56, 16, 128, "f32"),   # NC=8
        (128, 128, 56, 16, 256, "f32"),   # NC=16
        (128, 128, 56, 16, 512, "f32"),   # NC=32
        # growth check on the SAFE chunk: does c8 stay safe at huge NC?
        (128, 128, 56, 8, 3008, "f32"),   # NC=376
        # bf16 flagship point at its production T (sanity: known-good)
        (128, 128, 64, 16, 512, "bf16"),  # NC=32
        (128, 128, 64, 16, 1504, "bf16"),  # NC=94
    ]
    for hp, pp, bp, ch, T, dt in cases:
        ok, size, dt_s = try_compile(hp, pp, bp, ch, T, dt)
        print(json.dumps({"hp": hp, "pp": pp, "bp": bp, "ch": ch, "T": T,
                          "dtype": dt, "compiles": ok, "scoped": size,
                          "dt": dt_s}), flush=True)
    print("[diag2] DONE", flush=True)


if __name__ == "__main__":
    main()
