#!/bin/bash
# Round-5 follow-up TPU orchestrator (second attempt):
#   A: corrected chained streaming bench (device-scalar trip counts — the
#      static-n version put a full XLA recompile inside the timed region)
#   B: full-CLI epoch path, cold + warm persistent cache, bf16 (matches
#      the round-3 table's configuration; the first attempt ran f32 and
#      died on the k2 probe bug)
#   C: the f32 (parity-mode) epoch that CRASHED the first attempt at
#      device compile — proves the k3 T-aware probe fix end-to-end
#
# Tunnel discipline: one TPU process at a time, never killed, quiet gaps
# between stages, launch deadline.
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

# Stage A: chained streaming bench (corrected)
python scripts/tpu_measure_r5b.py > /root/repo/tpu_r5b.log 2>&1
echo "[orch] stage A rc=$? $(date -u +%H:%M:%S)"
grep '"stage"' /root/repo/tpu_r5b.log
sleep 120

# Stage B: full-CLI epoch path, cold then warm persistent cache (bf16)
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
        --compute_dtype bfloat16 \
        --max_epochs 6 --bucket_lengths single --fuse_fractions 32 \
        --compilation_cache_dir "$CACHE" \
        > "/root/repo/tpu_r5_epoch_${tag}.log" 2>&1)
    echo "[orch] stage B($tag) rc=$? $(date -u +%H:%M:%S)"
    grep -E "^ *[0-9]+ \|" "/root/repo/tpu_r5_epoch_${tag}.log" | head -7
    sleep 120
  fi
done

# Stage C: the f32 parity-mode epoch that crashed attempt 1 (k2 probe bug:
# a T=2-chunk verdict blessed CH=16 at NC=47 and the train_scan compile
# died with a 16.98M scoped-VMEM overflow). With k3 T-keyed verdicts the
# shipped defaults already say c16@n47=False / c8@n94=True, so the run
# must pick CH=8 and complete. One epoch is enough for the proof.
if may_launch && [ -f "$DATA/timit_trainD117.nc" ]; then
  RUN=$(mktemp -d)
  (cd "$RUN" && \
    python -m lstm_rnn_tpu.cli "$EX/config.cfg" \
      --network "$EX/network.jsn" \
      --train_file "$DATA/timit_trainD117.nc" \
      --val_file "$DATA/timit_cvD117.nc" \
      --max_epochs 1 --bucket_lengths single --fuse_fractions 32 \
      --compilation_cache_dir "$CACHE" \
      > "/root/repo/tpu_r5_epoch_f32.log" 2>&1)
  echo "[orch] stage C(f32) rc=$? $(date -u +%H:%M:%S)"
  grep -E "^ *[0-9]+ \||vmem_probe" "/root/repo/tpu_r5_epoch_f32.log" | head -10
fi

echo "[orch] DONE $(date -u +%H:%M:%S)"
