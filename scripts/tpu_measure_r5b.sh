#!/bin/bash
# Round-5 follow-up TPU orchestrator: corrected streaming measurement +
# the full-CLI epoch re-measure that failed in the first session (the
# TIMIT config names network.jsn RELATIVE to cwd; the run dir is a
# mktemp — pass --network absolutely).
#
# Same tunnel discipline as tpu_measure_r5.sh: one TPU process at a
# time, never killed, quiet gaps between stages, launch deadline.
#
# Usage: nohup bash scripts/tpu_measure_r5b.sh > /root/repo/tpu_r5b_orch.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

DEADLINE=$(( $(date +%s) + ${ORCH_BUDGET:-14400} ))
relay_up() { [ -n "${AXON_LOOPBACK_RELAY:-}" ] || \
  timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/10000' 2>/dev/null; }
may_launch() { [ "$(date +%s)" -lt "$DEADLINE" ] && relay_up; }

echo "[orch] start $(date -u +%H:%M:%S)"
while ! relay_up; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[orch] relay never returned before the deadline; giving up"
    exit 1
  fi
  sleep 60
done
echo "[orch] relay up $(date -u +%H:%M:%S)"

# Stage A: chained streaming bench
python scripts/tpu_measure_r5b.py > /root/repo/tpu_r5b.log 2>&1
echo "[orch] stage A rc=$? $(date -u +%H:%M:%S)"
grep '"stage"' /root/repo/tpu_r5b.log
sleep 120

# Stage B: full-CLI epoch path, cold then warm persistent cache
CACHE=/root/repo/.xla_cache_r5
rm -rf "$CACHE"
EX=/root/repo/examples/phoneme_recognition_timit
DATA=/root/repo/examples/alignments
for tag in cold warm; do
  if may_launch && [ -f "$DATA/timit_trainD117.nc" ]; then
    RUN=$(mktemp -d)
    (cd "$RUN" && \
      python -m lstm_rnn_tpu.cli "$EX/config.cfg" \
        --network "$EX/network.jsn" \
        --train_file "$DATA/timit_trainD117.nc" \
        --val_file "$DATA/timit_cvD117.nc" \
        --max_epochs 6 --bucket_lengths single --fuse_fractions 32 \
        --compilation_cache_dir "$CACHE" \
        > "/root/repo/tpu_r5_epoch_${tag}.log" 2>&1)
    echo "[orch] stage B($tag) rc=$? $(date -u +%H:%M:%S)"
    grep -E "^ *[0-9]+ \|" "/root/repo/tpu_r5_epoch_${tag}.log" | head -7
    sleep 120
  fi
done

echo "[orch] DONE $(date -u +%H:%M:%S)"
