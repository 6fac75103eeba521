"""Probe the fused softmax+CE tail families at the shipped-recipe shapes
and print the t1 entries for vmem_probe_defaults.json. The tail families
have shipped no device verdicts so far — every fresh machine pays the
Trainer's eager first-use probe compiles at init; these defaults cover
the TIMIT flagship (proj tail, P=512 Sp=256) and the LVCSR wide route
(proj refusal + wide (SB, rows) + the wide forward's plain tail at the
wide padded width) in bf16, honest f32, and the x3 f32-matmul mode.

Usage: nohup python scripts/tpu_probe_tail_defaults.py > /root/repo/tpu_tail.log 2>&1 &
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
    from lstm_rnn_tpu.ops.softmax_ce import wide_plan

    print(f"[tail] devices: {jax.devices()}", flush=True)
    # The REAL recipe shapes, derived from the builder's pad plan (the
    # first shipped batch hardcoded P=512 — but BLSTM(250) pads per
    # DIRECTION: 2*round_up(125,128) = 256, the point the Trainer
    # actually probes; the P512 entries are dead keys)
    from lstm_rnn_tpu.models.flagship import build_timit_network
    from lstm_rnn_tpu.ops.lstm_cell import round_up
    net = build_timit_network()
    P = net._pad_plan()[-1][2]   # softmax padded fan-in (256)
    Sp = round_up(net.specs[-2].size, 128)   # 183 -> 256
    print(f"[tail] flagship P={P} Sp={Sp}", flush=True)
    # (dtype, x3) modes: the plain tail's footprint is mode-independent
    # (its key carries no x3 suffix) so x3 only re-probes proj/wide
    modes = [(jnp.bfloat16, False), (jnp.float32, False),
             (jnp.float32, True)]
    for cdt, x3 in modes:
        lc.F32_MATMUL_3X = x3
        tag = f"{jnp.dtype(cdt).name}{'x3' if x3 else ''}"
        try:
            rows = vp.ensure_tail_validated(P, Sp, cdt, proj=True)
            print(f"[tail] {tag} proj P{P} Sp{Sp} -> rows={rows}",
                  flush=True)
            if not x3:
                rows = vp.ensure_tail_validated(0, Sp, cdt, proj=False)
                print(f"[tail] {tag} plain Sp{Sp} -> rows={rows}",
                      flush=True)
            # LVCSR (same stack, softmax 10112 -> 10240): proj refusal
            # ladder (the router reads it), then the wide route
            rows = vp.ensure_tail_validated(P, 10240, cdt, proj=True)
            print(f"[tail] {tag} proj P{P} Sp10240 -> rows={rows}",
                  flush=True)
            blocks = vp.ensure_wide_validated(P, cdt)
            print(f"[tail] {tag} wide P{P} -> {blocks}", flush=True)
            if not x3:
                spw = wide_plan(1 << 20, P, 10112, cdt)[0]
                rows = vp.ensure_tail_validated(0, spw, cdt, proj=False)
                print(f"[tail] {tag} wide-fwd plain Sp{spw} -> rows={rows}",
                      flush=True)
        finally:
            lc.F32_MATMUL_3X = False
    table = {k: v for k, v in vp._load().items()
             if f"|{vp.TAIL_VERSION}|" in k}
    print("[tail] t1 entries:")
    print(json.dumps(table, indent=0, sort_keys=True))
    print("[tail] DONE", flush=True)


if __name__ == "__main__":
    main()
