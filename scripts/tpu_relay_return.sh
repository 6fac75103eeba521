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
# Loopback-relay plugin scheme (AXON_LOOPBACK_RELAY=1): the pool svc rides
# the plugin boot process's own local listeners, NOT the classic 10000
# port — probing it reports "down" on a HEALTHY tunnel (utils/device.py
# _relay_down_reason). Only gate on the port in the classic scheme.
if [ -z "${AXON_LOOPBACK_RELAY:-}" ]; then
  while ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/10000' 2>/dev/null; do
    [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "[rr] deadline"; exit 1; }
    sleep 60
  done
  echo "[rr] relay up $(date -u +%H:%M:%S)"; sleep 90
fi
BENCH_MAX_WAIT=900 python bench.py
echo "[rr] bench rc=$? $(date -u +%H:%M:%S)"; sleep 120
python scripts/tpu_probe_carry_defaults.py
echo "[rr] carry rc=$? $(date -u +%H:%M:%S)"; sleep 120
python scripts/tpu_probe_tail_defaults.py
echo "[rr] tail rc=$? $(date -u +%H:%M:%S)"; sleep 120
python scripts/tpu_probe_mask_ct.py
echo "[rr] mask_ct rc=$? $(date -u +%H:%M:%S)"
echo "[rr] DONE"
