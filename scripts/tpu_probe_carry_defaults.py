"""Probe the carry-kernel GRADIENT family (sequence-parallel training's
block scans) at realistic per-device block lengths and print the k3
entries for vmem_probe_defaults.json. The carry family has shipped no
device verdicts so far — SP-on-TPU runs pay first-use probes; these
defaults cover the flagship corpus split 2/4 ways plus the probe floor.

Usage: nohup python scripts/tpu_probe_carry_defaults.py > /root/repo/tpu_carry.log 2>&1 &
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

    from lstm_rnn_tpu.ops import vmem_probe as vp

    print(f"[carry] devices: {jax.devices()}", flush=True)
    # per-device block lengths for the T=752 corpus over 2 / 4 seq
    # devices (_pad_time(granule=16)): 384, 192; plus the bench T=512
    # split 2 ways (256) and the 16-frame floor
    for dt_name, bp in [("bf16", 64), ("f32", 56)]:
        cdt = jnp.bfloat16 if dt_name == "bf16" else jnp.float32
        for hp, pp in [(128, 128), (128, 256)]:
            for T in (384, 192, 256, 16):
                ch = vp.ensure_validated(T, hp, pp, bp, cdt, carry=True)
                print(f"[carry] {dt_name} (h{hp},p{pp},b{bp}) T={T} "
                      f"-> CH={ch}", flush=True)
    table = {k: v for k, v in vp._load().items()
             if f"|{vp.KERNEL_VERSION}|" in k and k.endswith("|cr")}
    print("[carry] k3 carry entries:")
    print(json.dumps(table, indent=0, sort_keys=True))
    print("[carry] DONE", flush=True)


if __name__ == "__main__":
    main()
