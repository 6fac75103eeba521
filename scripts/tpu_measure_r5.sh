#!/bin/bash
# Round-5 TPU measurement orchestrator.
#
# The axon tunnel is single-client: every stage runs as its OWN process,
# strictly sequentially, with quiet gaps between exits so the remote side
# releases the claim cleanly. A TPU client is NEVER killed (no `timeout`
# around TPU processes — killing one mid-compile wedges the remote side
# for 5-10+ min); instead a LAUNCH deadline gates whether the next stage
# may start, so a dead relay can't make this session collide with the
# driver's end-of-round bench.py run.
#
# Usage: nohup bash scripts/tpu_measure_r5.sh > /root/repo/tpu_r5_orch.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

DEADLINE=$(( $(date +%s) + ${ORCH_BUDGET:-14400} ))  # stop LAUNCHING after 4h
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

# Stage A: mask probe + streaming + TIMIT/LVCSR benches + wide-step profile
python scripts/tpu_measure_r5.py > /root/repo/tpu_r5.log 2>&1
echo "[orch] stage A rc=$? $(date -u +%H:%M:%S)"
grep '"stage"' /root/repo/tpu_r5.log
sleep 120

# Stage B: the exact driver bench path, end to end
if may_launch; then
  BENCH_MAX_WAIT=900 BENCH_MAX_RETRIES=3 \
    python bench.py > /root/repo/tpu_r5_bench.log 2>&1
  echo "[orch] stage B rc=$? $(date -u +%H:%M:%S)"
  tail -1 /root/repo/tpu_r5_bench.log
  sleep 120
fi

# Stage C: full-CLI epoch path with the round-4 features (VERDICT r5 #4):
# cold persistent cache (background whole-epoch compile active — grouped
# flushes must carry epoch 1), then warm. Round-3 baseline: 293 s warm /
# ~1400 s cold epoch 1, ~2.4M steady state.
CACHE=/root/repo/.xla_cache_r5
rm -rf "$CACHE"   # 'cold' must really be cold, even on orchestrator reruns
DATA=/root/repo/examples/alignments
for tag in cold warm; do
  if may_launch && [ -f "$DATA/timit_trainD117.nc" ]; then
    RUN=$(mktemp -d)
    (cd "$RUN" && \
      python -m lstm_rnn_tpu.cli \
        /root/repo/examples/phoneme_recognition_timit/config.cfg \
        --train_file "$DATA/timit_trainD117.nc" \
        --val_file "$DATA/timit_cvD117.nc" \
        --max_epochs 6 --bucket_lengths single --fuse_fractions 32 \
        --compilation_cache_dir "$CACHE" \
        > "/root/repo/tpu_r5_epoch_${tag}.log" 2>&1)
    echo "[orch] stage C($tag) rc=$? $(date -u +%H:%M:%S)"
    grep -E "^ *[0-9]+ \|" "/root/repo/tpu_r5_epoch_${tag}.log" | head -7
    sleep 120
  fi
done

echo "[orch] DONE $(date -u +%H:%M:%S)"
