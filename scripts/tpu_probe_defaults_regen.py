"""Regenerate vmem_probe_defaults.json with the FINAL k3 probe code
(grid-size-keyed verdicts, both need_dx backward variants must compile).
Probes the production matrix on the real device, then prints the k3
entries accumulated in the runtime cache; the caller copies them into
lstm_rnn_tpu/ops/vmem_probe_defaults.json.

Matrix: the TIMIT/LVCSR flagship layer shapes — (hp=128, pp=128) layer 1
and (hp=128, pp=256) layers 2-5 — at the bench T=512 and corpus T=752,
for bf16 (bp=64), f32 and f32-x3 (bp=56); plus the masked streaming
family at the serving chunk (tp=64).

Usage: nohup python scripts/tpu_probe_defaults_regen.py > /root/repo/tpu_regen.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from lstm_rnn_tpu.utils.device import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import lstm_cell as lc
    from lstm_rnn_tpu.ops import vmem_probe as vp

    print(f"[regen] devices: {jax.devices()}", flush=True)
    shapes = [(128, 128), (128, 256)]
    for dt_name, bp, use3 in [("bf16", 64, False), ("f32", 56, False),
                              ("f32x3", 56, True)]:
        cdt = jnp.bfloat16 if dt_name == "bf16" else jnp.float32
        old3 = lc.F32_MATMUL_3X
        lc.F32_MATMUL_3X = use3
        try:
            for hp, pp in shapes:
                for T in (512, 752):
                    ch = vp.ensure_validated(T, hp, pp, bp, cdt)
                    print(f"[regen] {dt_name} (h{hp},p{pp},b{bp}) T={T} "
                          f"-> CH={ch}", flush=True)
        finally:
            lc.F32_MATMUL_3X = old3

    # masked streaming family at the common serving chunk (tp=64)
    for hp, pp in shapes:
        for dt_name, bp in [("bf16", 64), ("f32", 56)]:
            cdt = jnp.bfloat16 if dt_name == "bf16" else jnp.float32
            ch = vp.ensure_mask_validated(64, hp, pp, bp, cdt)
            print(f"[regen] mask {dt_name} (h{hp},p{pp},b{bp}) tp=64 "
                  f"-> CH={ch}", flush=True)

    table = {k: v for k, v in vp._load().items()
             if f"|{vp.KERNEL_VERSION}" in k}
    print("[regen] k3 cache entries:")
    print(json.dumps(table, indent=0, sort_keys=True))
    print("[regen] DONE", flush=True)


if __name__ == "__main__":
    main()
