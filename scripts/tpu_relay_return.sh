#!/bin/bash
# Post-relay-return session: bench sanity check + the missing probe-family
# defaults (carry + tail) + the carry_t-variant mask probe. One TPU client
# at a time; stages are sequenced with quiet gaps so a failed init cannot
# wedge the next stage's claim.
# Usage: nohup bash scripts/tpu_relay_return.sh > /root/repo/tpu_relay_return.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=$(( $(date +%s) + ${ORCH_BUDGET:-21600} ))
while ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/10000' 2>/dev/null; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "[rr] deadline"; exit 1; }
  sleep 60
done
echo "[rr] relay up $(date -u +%H:%M:%S)"; sleep 90
BENCH_MAX_WAIT=900 python bench.py
echo "[rr] bench rc=$? $(date -u +%H:%M:%S)"; sleep 120
python scripts/tpu_probe_carry_defaults.py
echo "[rr] carry rc=$? $(date -u +%H:%M:%S)"; sleep 120
python scripts/tpu_probe_tail_defaults.py
echo "[rr] tail rc=$? $(date -u +%H:%M:%S)"; sleep 120
python scripts/tpu_probe_mask_ct.py
echo "[rr] mask_ct rc=$? $(date -u +%H:%M:%S)"
echo "[rr] DONE"
