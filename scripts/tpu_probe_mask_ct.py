"""Device-validate the carry_t-variant masked streaming program — the
round-5 review fix: serving dispatches carry_t = the RAW --stream_chunk,
which for non-16-multiple chunks is a different static program than the
carry_t == T variant the probe used to compile. Probes the flagship
serving shapes at a deliberately non-16-multiple chunk (50 -> tp 64,
carry_t 50) plus the default 64, and prints the k3m1 entries for
vmem_probe_defaults.json.

Usage: nohup python scripts/tpu_probe_mask_ct.py > /root/repo/tpu_mask_ct.log 2>&1 &
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
    from lstm_rnn_tpu.ops.lstm_cell import fused_padded_dims

    print(f"[mask_ct] devices: {jax.devices()}", flush=True)
    # Streaming serves UNIDIRECTIONAL stacks: the flagship serving net is
    # 5xLSTM(250) -> h=250 pads to hp=256 (NOT the blstm training 125->128
    # the first batch probed); layer 1 sees p=117->128, layers 2+ p=250->256
    for dt_name, cdt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        for hdim, pdim in [(250, 117), (250, 250), (125, 117), (125, 125)]:
            for chunk, bsz in [(50, 64), (64, 64)]:
                h, p, b, tp = fused_padded_dims(hdim, pdim, bsz, chunk, cdt)
                ch = vp.ensure_mask_validated(tp, h, p, b, cdt,
                                              carry_t=chunk)
                print(f"[mask_ct] {dt_name} (h{h},p{p},b{b}) "
                      f"chunk={chunk} tp={tp} -> CH={ch}", flush=True)
    table = {k: v for k, v in vp._load().items()
             if f"|{vp.KERNEL_VERSION}{vp.MASK_VERSION}|" in k}
    print("[mask_ct] k3m1 entries:")
    print(json.dumps(table, indent=0, sort_keys=True))
    print("[mask_ct] DONE", flush=True)


if __name__ == "__main__":
    main()
