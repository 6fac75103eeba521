"""Diagnose the round-5 probe-fidelity gap: the runtime probe recorded
(h=128, p=128, b=56, c=16, f32) as FITTING (its T=2*ch, need_dx=True
composition compiled), but the real TIMIT f32 training program's layer-1
backward kernel (T=752 -> NC=47, need_dx=False) overflowed scoped VMEM
by 1004K at compile (tpu_r5_epoch_cold.log). AOT-compile the matrix of
(chunk, T, need_dx) at that point to pin WHICH difference flips the
verdict. Compile-only: nothing executes on the chip.

Usage: nohup python scripts/tpu_probe_diag.py > /root/repo/tpu_probe_diag.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import lstm_cell as lc

    print(f"[diag] devices: {jax.devices()}", flush=True)
    hp, pp, bp = 128, 128, 56
    D = 2
    cases = [
        (16, 32, True),    # the probe's exact composition (recorded True)
        (16, 32, False),
        (16, 752, True),
        (16, 752, False),  # the real failing composition
        (8, 752, False),   # fallback candidates must fit
        (4, 752, False),
        (8, 32, True),     # probe composition at c8 (for the re-probe)
    ]
    for ch, T, need_dx in cases:
        def loss(x, w_in, w_rec, peep, bias, lengths, dh,
                 _dx=need_dx):
            h = lc.lstm_scan_fused(x, w_in, w_rec, peep, bias, lengths,
                                   1.0, True, False, jnp.dtype(jnp.float32),
                                   need_dx=_dx)
            return jnp.sum(h.astype(jnp.float32) * dh)

        argnums = (0, 1, 2, 3, 4) if need_dx else (1, 2, 3, 4)
        g = jax.grad(loss, argnums=argnums)
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
            ok, err = True, ""
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            low = msg.lower()
            if "exceed" in low and ("scoped" in low or "vmem" in low):
                ok = False
                # surface the reported scoped size
                err = next((ln.strip() for ln in msg.splitlines()
                            if "Scoped allocation" in ln), msg[:200])
            else:
                ok, err = None, f"{type(e).__name__}: {msg[:200]}"
        finally:
            lc._chunk_override = old
        print(json.dumps({"ch": ch, "T": T, "need_dx": need_dx,
                          "compiles": ok, "dt": round(time.time() - t0, 1),
                          "err": err[:300]}), flush=True)
    print("[diag] DONE", flush=True)


if __name__ == "__main__":
    main()
